"""Basic blocks: nonlinearities, FeedForward, ResidualConnection.

Parity targets:
  * set_nonlinearity (reference model/utils/nonlinearity.py:43-53):
    relu / swish (SiLU) / tanh / none.
  * FeedForward (reference mixer_block.py:37-87): a single Linear when
    nonlinearity is none, else Linear-act-Linear, optionally wrapped in a
    residual+LayerNorm.
  * ResidualConnection (reference residual_connection.py:5-37):
    y = dropout(LayerNorm(f(x) + x)), tuple outputs pass extras through.

LayerNorm uses eps=1e-5 (torch default) — flax's default is 1e-6.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-5


def set_nonlinearity(name: Optional[str]) -> Optional[Callable]:
    if name is None or name == "none":
        return None
    table = {
        "relu": nn.relu,
        "swish": nn.silu,
        "silu": nn.silu,
        "tanh": jnp.tanh,
    }
    if name not in table:
        raise ValueError(f"unknown nonlinearity {name!r}")
    return table[name]


class ResidualConnection(nn.Module):
    """y = dropout(LN(module(x, ...) + x)); extra tuple outputs pass through."""

    module: nn.Module
    use_layer_norm: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *args, deterministic: bool = True, **kwargs):
        y = self.module(x, *args, **kwargs)
        others = None
        if isinstance(y, (tuple, list)):
            others = tuple(y[1:])
            y = y[0]
        y = y + x
        if self.use_layer_norm:
            y = nn.LayerNorm(epsilon=LN_EPS)(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        if others is not None:
            return (y, *others)
        return y


class FeedForward(nn.Module):
    """Linear or Linear-act-Linear with optional residual+LN wrap."""

    hidden_size: int
    bottleneck_size: Optional[int] = None
    output_size: Optional[int] = None
    nonlinearity: Optional[str] = None
    residual: bool = False
    residual_layer_norm: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bottleneck = (
            self.hidden_size if self.bottleneck_size is None else self.bottleneck_size
        )
        out_size = (
            self.hidden_size if self.output_size is None else self.output_size
        )
        if self.residual and self.hidden_size != out_size:
            raise ValueError(
                "hidden_size must equal output_size when residual is True"
            )
        act = set_nonlinearity(self.nonlinearity)
        y = x
        if act is None:
            y = nn.Dense(out_size, use_bias=self.use_bias, name="feedforward")(y)
        else:
            y = nn.Dense(bottleneck, use_bias=self.use_bias, name="input")(y)
            y = act(y)
            y = nn.Dense(out_size, use_bias=self.use_bias, name="output")(y)
        if self.residual:
            y = y + x
            if self.residual_layer_norm:
                y = nn.LayerNorm(epsilon=LN_EPS)(y)
        return y
