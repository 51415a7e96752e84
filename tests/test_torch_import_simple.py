"""Full-model import for SimpleLSTM: torch replica of the reference's
module tree (simple_lstm.py:48-188 wiring, intent semantics per PARITY.md
deviation 7) -> mapping table -> identical outputs."""

import pytest
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from multimodalreactiongeneration_tpu.models.simple_lstm import SimpleLSTM
from multimodalreactiongeneration_tpu.models.torch_import import (
    import_simple_lstm_state_dict,
)
from tests.test_simple_lstm import CFG



pytestmark = pytest.mark.slow
class RefLSTMLayered(tnn.Module):
    """LSTMLayerd(use_mixing=True, use_residual, use_layer_norm, use_ff)."""

    def __init__(self, num_layers, in_size, hidden, affine, bottleneck,
                 out_size, bidirectional=True, use_ff=True):
        super().__init__()

        def block(i):
            _in = in_size if i == 0 else affine
            _out = out_size if i == num_layers - 1 else affine

            class Inner(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.lstm_module = tnn.LSTM(
                        _in, hidden, batch_first=True,
                        bidirectional=bidirectional,
                    )
                    self.mixer = tnn.Linear(
                        hidden * (2 if bidirectional else 1), affine
                    )

                def forward(self, x):
                    return self.mixer(self.lstm_module(x)[0])

            class ResLSTM(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.module = Inner()
                    self.layer_norm = tnn.LayerNorm(affine)

                def forward(self, x):
                    return self.layer_norm(self.module(x) + x)

            class FF(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.input = tnn.Linear(affine, bottleneck)
                    self.mapping = tnn.Linear(bottleneck, _out)

                def forward(self, x):
                    return self.mapping(torch.relu(self.input(x)))

            class ResFF(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.module = FF()
                    self.layer_norm = tnn.LayerNorm(_out)

                def forward(self, x):
                    return self.layer_norm(self.module(x) + x)

            class Block(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.lstm_module = ResLSTM()
                    if use_ff:
                        self.feed_forward_module = ResFF()

                def forward(self, x):
                    y = self.lstm_module(x)
                    if use_ff:
                        y = self.feed_forward_module(y)
                    return y

            return Block()

        self.lstm_layered = tnn.ModuleList(
            [block(i) for i in range(num_layers)]
        )

    def forward(self, x):
        for b in self.lstm_layered:
            x = b(x)
        return x


class RefSimpleLSTM(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        h, lh, bn = cfg["acostic_affine_size"], cfg["acostic_lstm_size"], 8

        enc = tnn.Module()
        enc.embed_layer = tnn.Linear(81, h)
        enc.acostic_lstm = RefLSTMLayered(
            cfg["acostic_num_layers"], h, lh, h, cfg["acostic_bottleneck_size"]
            if "acostic_bottleneck_size" in cfg else 64, h,
        )
        self.acoustic_encoder = enc

        menc = tnn.Module()
        menc.embed_layer = tnn.Linear(18, h)
        menc.motion_lstm = RefLSTMLayered(
            cfg["motion_num_layers"], h, lh, h, 64, h
        )
        self.motion_encoder = menc

        class AttBlock(tnn.Module):
            def __init__(self):
                super().__init__()

                class Seq(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.cross_modal_att = tnn.MultiheadAttention(
                            h, cfg["att_heads"], batch_first=True,
                            kdim=h, vdim=h,
                        )
                        self.projection = tnn.Linear(h, h)

                    def forward(self, m1, m2):
                        y, _ = self.cross_modal_att(
                            m1, m2, m2, need_weights=False
                        )
                        return self.projection(y)

                class Res(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.module = Seq()
                        self.layer_norm = tnn.LayerNorm(h)

                    def forward(self, m1, m2):
                        return self.layer_norm(self.module(m1, m2) + m1)

                self.att_module = Res()

            def forward(self, m1, m2):
                return self.att_module(m1, m2)

        att = tnn.Module()
        att.att_layers = tnn.ModuleList(
            [AttBlock() for _ in range(cfg["att_num_layers"])]
        )
        self.multimodal_att = att

        dec = tnn.Module()
        dec.decoder_lstm = RefLSTMLayered(
            cfg["decoder_num_layers"], h, cfg["decoder_lstm_size"], h,
            cfg["decoder_bottleneck_size"], h,
        )
        mapping = tnn.Module()
        mapping.input = tnn.Linear(h, cfg["decoder_mapping_size"])
        mapping.output = tnn.Linear(cfg["decoder_mapping_size"], 18)
        dec.mapping = mapping
        self.motion_decoder = dec

    def forward(self, acoustic, motion):
        a = self.acoustic_encoder.acostic_lstm(
            self.acoustic_encoder.embed_layer(acoustic)
        )
        m = self.motion_encoder.motion_lstm(
            self.motion_encoder.embed_layer(motion)
        )
        y = m
        for layer in self.multimodal_att.att_layers:
            y = layer(y, a)
        y = self.motion_decoder.decoder_lstm(y)
        y = y[:, -1:, :]
        return self.motion_decoder.mapping.output(
            torch.relu(self.motion_decoder.mapping.input(y))
        )


def test_simple_lstm_full_import():
    # the small test CFG already uses uniform sizes (affine == output)
    cfg = dict(CFG)
    torch.manual_seed(0)
    t_model = RefSimpleLSTM(cfg)
    fb = torch.randn(2, 48, 81)
    mo = torch.randn(2, 10, 18)
    with torch.no_grad():
        t_y = t_model(fb, mo)

    # NOTE: torch MHA with kdim==vdim==edim stores a single in_proj_weight;
    # the importer splits it into q/k/v (train/checkpoint.py)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    cfg_map = dict(cfg, acostic_bottleneck_size=64)
    params = {"params": import_simple_lstm_state_dict(sd, cfg_map)}

    model = SimpleLSTM(cfg=dict(cfg, motion_bottleneck_size=64,
                                acostic_bottleneck_size=64))
    y = model.apply(
        {"params": params["params"]},
        jnp.asarray(fb.numpy()),
        jnp.asarray(mo.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=2e-5)
