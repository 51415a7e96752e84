"""Pallas rectangular attention (benchmarks/pallas_rect_attention.py,
demoted from the model path — see its docstring) vs the XLA mask path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from multimodalreactiongeneration_tpu.nn.attention import scaled_dot_attention
from multimodalreactiongeneration_tpu.ops import pallas_rect_attention as pa
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


class _PadModal:
    pass


def _modal_with_pad(key, b, t, d, n_pad):
    """(B, T, D) stream whose last n_pad frames are -100 padding."""
    x = jax.random.normal(key, (b, t, d))
    if n_pad:
        pad = jnp.full((b, n_pad, d), -100.0)
        x = jnp.concatenate([x[:, : t - n_pad], pad], axis=1)
    return x


@pytest.mark.parametrize("lq,lk,npq,npk", [(32, 256, 5, 40), (64, 16, 9, 3)])
def test_torchmha_rect_pad_dispatch_matches_xla(monkeypatch, lq, lk, npq, npk):
    """TorchMHA(rect_pad_masks=True) under MRGEN_FUSED_ATTN=force must
    equal the XLA mask path (outputs AND grads) for masks built by
    merged_attention_mask — the production integrator path."""
    from multimodalreactiongeneration_tpu.nn.attention import TorchMHA

    b, e, h = 2, 32, 2
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    # the mask is built from the RAW -100-flagged streams; the attention
    # inputs are ENCODER OUTPUTS (bounded) — production conditions.
    # Feeding raw -100 values into attention saturates the softmax and
    # amplifies float reassociation in the grads far past any kernel
    # tolerance (both paths compute the same saturated math).
    mask = merged_attention_mask(
        _modal_with_pad(ks[0], b, lq, e, npq),
        _modal_with_pad(ks[1], b, lk, e, npk),
    )
    qmod = jax.random.normal(ks[2], (b, lq, e))
    kmod = jax.random.normal(ks[3], (b, lk, e))
    mha = TorchMHA(embed_dim=e, num_heads=h, rect_pad_masks=True)
    params = mha.init(jax.random.PRNGKey(4), qmod, kmod, kmod, mask)

    def loss(p, q, k):
        out = mha.apply(p, q, k, k, mask)
        return jnp.sum(out**2), out

    monkeypatch.setenv("MRGEN_FUSED_ATTN", "0")
    (l0, out0), g0 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        params, qmod, kmod
    )
    monkeypatch.setenv("MRGEN_FUSED_ATTN", "force")
    (l1, out1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        params, qmod, kmod
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=2e-5)
    for (path, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )
