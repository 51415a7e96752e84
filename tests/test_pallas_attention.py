"""Pallas rectangular attention (benchmarks/pallas_rect_attention.py,
demoted from the model path — see its docstring) vs the XLA mask path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from multimodalreactiongeneration_tpu.nn.attention import scaled_dot_attention
from benchmarks import pallas_rect_attention as pa
from multimodalreactiongeneration_tpu.ops.masks import (
    merged_attention_mask,
    rectangular_causal_mask,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # CPU test environment: run the kernel in interpreter mode
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )


@pytest.mark.parametrize("lq,lk", [(16, 128), (128, 16), (64, 64), (250, 2000)])
def test_matches_xla_path(lq, lk):
    b, h, d = 2, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, lq, d))
    k = jax.random.normal(ks[1], (b, h, lk, d))
    v = jax.random.normal(ks[2], (b, h, lk, d))

    ours = pa.rect_attention_mha(q, k, v)
    mask = rectangular_causal_mask(lq, lk)
    ref = scaled_dot_attention(q, k, v, mask[None, None])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_padding_pairs_match_xla():
    b, h, lq, lk, d = 2, 1, 32, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, h, lq, d))
    k = jax.random.normal(ks[1], (b, h, lk, d))
    v = jax.random.normal(ks[2], (b, h, lk, d))
    q_pad = jnp.zeros((b, lq), bool).at[:, -5:].set(True)
    k_pad = jnp.zeros((b, lk), bool).at[:, -10:].set(True)

    ours = pa.rect_attention_mha(q, k, v, q_pad, k_pad)
    # XLA path via the mask builder (first-channel sentinel convention)
    qm = jnp.where(q_pad[:, :, None], -100.0, 0.0) * jnp.ones((1, 1, 3))
    km = jnp.where(k_pad[:, :, None], -100.0, 0.0) * jnp.ones((1, 1, 3))
    mask = merged_attention_mask(qm, km)
    ref = scaled_dot_attention(q, k, v, mask[:, None])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_gradients_flow():
    b, h, lq, lk, d = 1, 1, 16, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, lq, d))
    k = jax.random.normal(ks[1], (b, h, lk, d))
    v = jax.random.normal(ks[2], (b, h, lk, d))

    def loss_pallas(q, k, v):
        return jnp.sum(pa.rect_attention_mha(q, k, v) ** 2)

    def loss_xla(q, k, v):
        mask = rectangular_causal_mask(lq, lk)
        return jnp.sum(scaled_dot_attention(q, k, v, mask[None, None]) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
