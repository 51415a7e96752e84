"""torch state_dict import: the reference's public checkpoint format
(torch.load(...)["state_dict"], model_loader.py:23-25) must map onto our
flax modules and reproduce outputs.

The torch modules below re-create the reference's wiring (lstm_block.py
LSTMModule/LSTMBlock, multi_modal_att.py attention block) in plain torch;
their state_dicts import via import_torch_state_dict.
"""

import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from multimodalreactiongeneration_tpu.nn.lstm_block import LSTMBlock
from multimodalreactiongeneration_tpu.train.checkpoint import (
    import_torch_state_dict,
)


class TorchRefLSTMBlock(tnn.Module):
    """Reference LSTMBlock (lstm_block.py:49-107): residual LSTM + FFN,
    use_mixing=False, LayerNorm wraps, matching our LSTMBlock naming."""

    def __init__(self, size=16, hidden=8, bottleneck=4):
        super().__init__()
        self.lstm = tnn.LSTM(size, hidden, batch_first=True, bidirectional=True)
        self.lstm_norm = tnn.LayerNorm(size)
        self.ff_input = tnn.Linear(size, bottleneck)
        self.ff_mapping = tnn.Linear(bottleneck, size)
        self.ff_norm = tnn.LayerNorm(size)

    def forward(self, x):
        y, _ = self.lstm(x)
        y = self.lstm_norm(y + x)
        f = self.ff_mapping(torch.relu(self.ff_input(y)))
        return self.ff_norm(f + y)


def test_lstm_block_state_dict_roundtrip():
    torch.manual_seed(0)
    t_block = TorchRefLSTMBlock()
    x = torch.randn(2, 7, 16)
    with torch.no_grad():
        t_y = t_block(x)

    sd = {k: v.detach().numpy() for k, v in t_block.state_dict().items()}
    params = import_torch_state_dict(
        sd,
        {
            "lstm": "lstm_module/lstm_module",
            "lstm_norm": "lstm_norm",
            "ff_input": "ff_input",
            "ff_mapping": "ff_mapping",
            "ff_norm": "ff_norm",
        },
    )

    model = LSTMBlock(
        input_size=16,
        hidden_size=8,
        lstm_out_size=16,
        bottleneck_size=4,
        output_size=16,
        bidirectional=True,
        use_mixing=False,
        use_residual=True,
        use_layer_norm=True,
        use_relu=True,
        use_feed_forward=True,
    )
    y, _ = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)


def test_mha_in_proj_split():
    torch.manual_seed(1)
    E, H = 16, 4
    t_mha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    x = torch.randn(2, 5, E)
    with torch.no_grad():
        t_y, _ = t_mha(x, x, x, need_weights=False)

    sd = {k: v.detach().numpy() for k, v in t_mha.state_dict().items()}
    params = import_torch_state_dict(sd, {"": "att"})

    from multimodalreactiongeneration_tpu.nn.attention import TorchMHA

    model = TorchMHA(embed_dim=E, num_heads=H)
    xj = jnp.asarray(x.numpy())
    y = model.apply({"params": params["att"]}, xj, xj, xj)
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)


def test_linear_and_layernorm_mapping():
    torch.manual_seed(2)
    lin = tnn.Linear(4, 6)
    sd = {k: v.detach().numpy() for k, v in lin.state_dict().items()}
    params = import_torch_state_dict(sd, {"": "dense"})
    assert params["dense"]["kernel"].shape == (4, 6)  # transposed
    np.testing.assert_allclose(
        params["dense"]["kernel"], sd["weight"].T
    )
