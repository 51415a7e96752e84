"""Layered-LSTM block stack (reference mr_gen/model/utils/lstm_block.py).

Three-level hierarchy, behavior-matched:
  * LSTMModule (:9-46):  LSTM + optional mixing Linear
  * LSTMBlock  (:49-107): LSTMModule (+ FFN bottleneck), residual/LN wraps
  * LSTMLayerd (:110-169): stack of N blocks, list-of-(h,c) state threading

Deviation (documented per SURVEY.md §7 "known reference quirks"):
the reference's LSTMLayerd.forward returns the *input* ``hxs`` instead of
the freshly collected states (lstm_block.py:164-169), so downstream AR
decoding (lstm_with_sample.py:229,376) silently never carries LSTM memory.
We return the NEW states (the evident intent). The AR engine exposes a
``carry_lstm_state`` switch for replicating the reference's effective
behavior when a side-by-side comparison is needed.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalreactiongeneration_tpu.nn.basic import LN_EPS
from multimodalreactiongeneration_tpu.nn.recurrent import LSTMState, TorchLSTM

LayerStates = List[Optional[LSTMState]]


class LSTMModule(nn.Module):
    """nn.LSTM + optional mixing Linear (reference lstm_block.py:9-46)."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    output_size: int = 256
    dropout: float = 0.0
    bidirectional: bool = True
    use_mixing: bool = True

    @nn.compact
    def __call__(self, x, hx=None, *, deterministic: bool = True):
        lstm_out = self.hidden_size * (2 if self.bidirectional else 1)
        if not self.use_mixing and lstm_out != self.output_size:
            raise ValueError(
                "lstm_out_size must equal output_size when use_mixing is False"
            )
        hs, hx = TorchLSTM(
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            dropout=self.dropout,
            bidirectional=self.bidirectional,
            name="lstm_module",
        )(x, hx, deterministic=deterministic)
        if self.use_mixing:
            hs = nn.Dense(self.output_size, name="mixer")(hs)
        return hs, hx


class LSTMBlock(nn.Module):
    """LSTMModule + optional FFN, both optionally residual+LN wrapped."""

    input_size: int
    hidden_size: int
    lstm_out_size: int
    num_layers: int = 1
    bottleneck_size: int = 64
    output_size: int = 256
    dropout: float = 0.0
    bidirectional: bool = True
    use_layer_norm: bool = True
    use_relu: bool = True
    use_mixing: bool = False
    use_residual: bool = True
    use_feed_forward: bool = True

    @nn.compact
    def __call__(self, x, hx=None, *, deterministic: bool = True):
        if self.use_residual and (
            self.input_size != self.lstm_out_size
            or self.lstm_out_size != self.output_size
        ):
            raise ValueError(
                "input_size must equal lstm_out_size and output_size "
                "when use_residual is set"
            )

        y, hx = LSTMModule(
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            output_size=self.lstm_out_size,
            dropout=self.dropout,
            bidirectional=self.bidirectional,
            use_mixing=self.use_mixing,
            name="lstm_module",
        )(x, hx, deterministic=deterministic)
        if self.use_residual:
            y = y + x
            if self.use_layer_norm:
                y = nn.LayerNorm(epsilon=LN_EPS, name="lstm_norm")(y)
            if self.dropout > 0:
                y = nn.Dropout(self.dropout)(y, deterministic=deterministic)

        if self.use_feed_forward:
            f = nn.Dense(self.bottleneck_size, name="ff_input")(y)
            if self.use_relu:
                f = nn.relu(f)
            f = nn.Dense(self.output_size, name="ff_mapping")(f)
            if self.use_residual:
                f = f + y
                if self.use_layer_norm:
                    f = nn.LayerNorm(epsilon=LN_EPS, name="ff_norm")(f)
                if self.dropout > 0:
                    f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            y = f
        return y, hx


class LSTMLayerd(nn.Module):
    """Stack of LSTMBlocks with per-layer state list (reference :110-169)."""

    input_size: int
    lstm_hidden_size: int
    affine_hidden_size: int = 256
    bottleneck_size: int = 64
    num_layers: int = 2
    num_layers_per_block: int = 1
    output_size: int = 256
    dropout: float = 0.0
    bidirectional: bool = True
    use_layer_norm: bool = True
    use_relu: bool = True
    use_mixing: bool = False
    use_residual: bool = True
    use_feed_forward: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        hxs: Optional[LayerStates] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, LayerStates]:
        direction_num = 2 if self.bidirectional else 1
        lstm_out = self.lstm_hidden_size * direction_num
        affine = self.affine_hidden_size if self.use_mixing else lstm_out

        new_states: LayerStates = []
        for i in range(self.num_layers):
            in_size = self.input_size if i == 0 else affine
            out_size = self.output_size if i == self.num_layers - 1 else affine
            hx = None if hxs is None else hxs[i]
            x, hx = LSTMBlock(
                input_size=in_size,
                hidden_size=self.lstm_hidden_size,
                lstm_out_size=affine,
                num_layers=self.num_layers_per_block,
                bottleneck_size=self.bottleneck_size,
                output_size=out_size,
                dropout=self.dropout,
                bidirectional=self.bidirectional,
                use_layer_norm=self.use_layer_norm,
                use_relu=self.use_relu,
                use_mixing=self.use_mixing,
                use_residual=self.use_residual,
                use_feed_forward=self.use_feed_forward,
                name=f"block_{i}",
            )(x, hx, deterministic=deterministic)
            new_states.append(hx)
        return x, new_states


class LSTMSampler(nn.Module):
    """Uni-LSTM + stride subsample: learned temporal downsampler.

    Reference lstm_sampler.py:6-34: h[:, rate-1::rate] keeps every
    ``decline_rate``-th hidden state (100 Hz audio -> 12.5 fps motion).
    """

    hidden_size: int
    num_layers: int
    dropout: float
    decline_rate: int

    @nn.compact
    def __call__(self, x, hx=None, *, deterministic: bool = True):
        h, hx = TorchLSTM(
            input_size=self.hidden_size,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            dropout=self.dropout,
            bidirectional=False,
            name="sampler",
        )(x, hx, deterministic=deterministic)
        return h[:, self.decline_rate - 1 :: self.decline_rate, :], hx
