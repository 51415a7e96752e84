"""Full-model checkpoint import: a pure-torch replica of the reference's
LSTMwithSample module tree (lstm_with_sample.py:92-130 wiring, including
the ResidualConnection nesting that shapes state_dict paths) is built,
its state_dict imported through the mapping table, and both models must
produce identical outputs on the same inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn as tnn

from multimodalreactiongeneration_tpu.models.lstm_with_sampling import (
    LSTMwithSample,
)
from multimodalreactiongeneration_tpu.models.torch_import import (
    import_lws_state_dict,
)

CFG = dict(
    sampling_rate=16000,
    shift=160,
    pred_fps=12.5,
    use_centroid=True,
    use_angle=True,
    nmels=26,
    delta_order=2,
    sampler_hidden_size=16,
    sampler_num_layers=1,
    sampler_dropout_rate=0.0,
    hidden_size=24,
    bottleneck_size=8,
    num_layers=2,
    num_lstm=1,
    dropout_rate=0.0,
    use_layer_norm=True,
    use_mixing=False,
    use_residual=True,
    use_relu=True,
)
RATIO = 8


class TorchRefLSTMwithSample(tnn.Module):
    """Reference wiring in plain torch (state_dict paths identical)."""

    def __init__(self, cfg):
        super().__init__()
        h = cfg["hidden_size"]
        sh = cfg["sampler_hidden_size"]
        motion_input = 36  # (3+3)*(2+1)*2
        self.acoustic_projection = tnn.Linear(81, sh)

        class Sampler(tnn.Module):
            def __init__(self):
                super().__init__()
                self.sampler = tnn.LSTM(sh, sh, batch_first=True)

            def forward(self, x):
                y, _ = self.sampler(x)
                return y[:, RATIO - 1 :: RATIO]

        self.sampling_lstm = Sampler()
        self.feature_projection = tnn.Linear(motion_input + sh, h)

        class Block(tnn.Module):
            """LSTMBlock(use_mixing=False, use_residual, use_layer_norm,
            use_feed_forward=False): ResidualConnection(LSTMModule)."""

            def __init__(self):
                super().__init__()

                class Inner(tnn.Module):  # LSTMModule w/o mixing
                    def __init__(self):
                        super().__init__()
                        # hidden = h (unidirectional, lstm_out == h)
                        self.lstm_module = tnn.LSTM(h, h, batch_first=True)

                    def forward(self, x):
                        return self.lstm_module(x)[0]

                class Res(tnn.Module):  # ResidualConnection
                    def __init__(self):
                        super().__init__()
                        self.module = Inner()
                        self.layer_norm = tnn.LayerNorm(h)

                    def forward(self, x):
                        return self.layer_norm(self.module(x) + x)

                self.lstm_module = Res()

            def forward(self, x):
                return self.lstm_module(x)

        self.layerd_lstm = tnn.Module()
        self.layerd_lstm.lstm_layered = tnn.ModuleList(
            [Block() for _ in range(cfg["num_layers"])]
        )

        ff = tnn.Module()
        ff.input = tnn.Linear(h, cfg["bottleneck_size"])
        ff.mapping = tnn.Linear(cfg["bottleneck_size"], motion_input // 2)
        self.feed_forward = ff

    def forward(self, acoustic, motion_p, motion_s):
        a = self.acoustic_projection(acoustic)
        a = self.sampling_lstm(a)
        x = torch.cat([a, motion_p, motion_s], dim=-1)
        x = self.feature_projection(x)
        for block in self.layerd_lstm.lstm_layered:
            x = block(x)
        x = self.feed_forward.mapping(torch.relu(self.feed_forward.input(x)))
        return x


@pytest.mark.slow
def test_full_model_import_reproduces_outputs():
    torch.manual_seed(0)
    t_model = TorchRefLSTMwithSample(CFG)
    B, T = 2, 6
    a = torch.randn(B, T * RATIO, 81)
    mp = torch.randn(B, T, 18)
    ms = torch.randn(B, T, 18)
    with torch.no_grad():
        t_y = t_model(a, mp, ms)

    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = {"params": import_lws_state_dict(sd, CFG)}

    model = LSTMwithSample(cfg=CFG)
    y, _ = model.apply(
        params,
        jnp.asarray(a.numpy()),
        jnp.asarray(mp.numpy()),
        jnp.asarray(ms.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)


@pytest.mark.slow
def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """Reference .ckpt file -> orbax dir -> load_checkpoint -> forward.

    Drives the migration CLI path end-to-end with a saved Lightning-style
    payload (the 'model.'-prefixed state_dict wrapper)."""
    from multimodalreactiongeneration_tpu.models.torch_import import (
        convert_checkpoint,
    )
    from multimodalreactiongeneration_tpu.train.checkpoint import (
        load_checkpoint,
    )

    torch.manual_seed(1)
    t_model = TorchRefLSTMwithSample(CFG)
    sd = {
        f"model.{k}": v.detach().numpy()
        for k, v in t_model.state_dict().items()
    }
    out = tmp_path / "imported"
    convert_checkpoint("lstm_with_sampling", CFG, sd, str(out), epoch=7)

    payload = load_checkpoint(str(out / "last"))
    assert payload["epoch"] == 7
    model = LSTMwithSample(cfg=CFG)
    B, T = 2, 6
    a = torch.randn(B, T * RATIO, 81)
    mp = torch.randn(B, T, 18)
    ms = torch.randn(B, T, 18)
    with torch.no_grad():
        t_y = t_model(a, mp, ms)
    y, _ = model.apply(
        payload["params"],
        jnp.asarray(a.numpy()),
        jnp.asarray(mp.numpy()),
        jnp.asarray(ms.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)


def test_convert_checkpoint_rejects_mismatched_model(tmp_path):
    from multimodalreactiongeneration_tpu.models.torch_import import (
        convert_checkpoint,
    )

    torch.manual_seed(2)
    t_model = TorchRefLSTMwithSample(CFG)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    wrong = dict(CFG, hidden_size=32)  # shapes won't line up
    with pytest.raises(ValueError, match="does not match"):
        convert_checkpoint("lstm_with_sampling", wrong, sd, str(tmp_path / "x"))
