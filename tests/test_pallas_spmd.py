"""Batch-dim SPMD partitioning of the Pallas RNN kernels: sharded
results and gradients must equal the unsharded reference (interpret-mode
kernels per shard on the 8-device CPU mesh; the partition callbacks and
the dwhh/dbhh psum are exactly what runs on a real TPU pod)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalreactiongeneration_tpu.ops import pallas_gru, pallas_lstm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("data",))


def _shard(mesh, x):
    return jax.device_put(
        x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    )


def test_lstm_sharded_forward_matches_unsharded():
    mesh = _mesh()
    B, T, H = 16, 24, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xw = jax.random.normal(ks[0], (B, T, 4 * H)) * 0.5
    w = jax.random.normal(ks[1], (H, 4 * H)) * 0.2
    h0 = jax.random.normal(ks[2], (B, H)) * 0.1
    c0 = jax.random.normal(ks[3], (B, H)) * 0.1

    ys_ref, (hn_ref, cn_ref) = jax.jit(pallas_lstm.lstm_recurrence)(
        xw, w, h0, c0
    )
    ys, (hn, cn) = jax.jit(pallas_lstm.lstm_recurrence)(
        _shard(mesh, xw), w, _shard(mesh, h0), _shard(mesh, c0)
    )
    assert len(ys.sharding.device_set) == 8  # actually partitioned
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hn_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref), atol=1e-6)


def test_lstm_sharded_grads_match_unsharded():
    """dwhh sums over the batch — the psum in the partitioned lowering
    must reproduce the unsharded weight gradient exactly."""
    mesh = _mesh()
    B, T, H = 16, 24, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    xw = jax.random.normal(ks[0], (B, T, 4 * H)) * 0.5
    w = jax.random.normal(ks[1], (H, 4 * H)) * 0.2
    h0 = jax.random.normal(ks[2], (B, H)) * 0.1
    c0 = jax.random.normal(ks[3], (B, H)) * 0.1

    def loss(xw, w, h0, c0):
        ys, (hn, cn) = pallas_lstm.lstm_recurrence(xw, w, h0, c0)
        return jnp.sum(ys**2) + jnp.sum(hn * cn)

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(xw, w, h0, c0)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        _shard(mesh, xw), w, _shard(mesh, h0), _shard(mesh, c0)
    )
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_gru_sharded_forward_and_grads_match():
    mesh = _mesh()
    B, T, H = 16, 24, 8
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    xw = jax.random.normal(ks[0], (B, T, 3 * H)) * 0.5
    w = jax.random.normal(ks[1], (H, 3 * H)) * 0.2
    b_hh = jax.random.normal(ks[2], (3 * H,)) * 0.1
    h0 = jax.random.normal(ks[3], (B, H)) * 0.1

    def loss(xw, w, b_hh, h0):
        ys, hn = pallas_gru.gru_recurrence(xw, w, b_hh, h0)
        return jnp.sum(ys**2) + jnp.sum(hn)

    y_ref, _ = jax.jit(pallas_gru.gru_recurrence)(xw, w, b_hh, h0)
    y, _ = jax.jit(pallas_gru.gru_recurrence)(
        _shard(mesh, xw), w, b_hh, _shard(mesh, h0)
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(xw, w, b_hh, h0)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        _shard(mesh, xw), w, b_hh, _shard(mesh, h0)
    )
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_stacked_lstm_sharded_matches_unsharded():
    """The wavefront stack kernel under a batch-sharded mesh: forward
    and every gradient (incl. the auto-psum'd outside-kernel dW einsums)
    must equal the unsharded run."""
    from multimodalreactiongeneration_tpu.ops import pallas_lstm_stacked

    mesh = _mesh()
    B, T, H, L = 16, 21, 8, 3
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    xw0 = jax.random.normal(ks[0], (B, T, 4 * H)) * 0.5
    w_ih_t = jax.random.normal(ks[1], (L - 1, H, 4 * H)) * 0.2
    b_rest = jax.random.normal(ks[2], (L - 1, 4 * H)) * 0.1
    w_hh_t = jax.random.normal(ks[3], (L, H, 4 * H)) * 0.2
    h0 = jax.random.normal(ks[4], (L, B, H)) * 0.1
    c0 = jax.random.normal(ks[5], (L, B, H)) * 0.1

    def loss(xw0, w_ih_t, b_rest, w_hh_t, h0, c0):
        ys, (hn, cn) = pallas_lstm_stacked.lstm_stacked_recurrence(
            xw0, w_ih_t, b_rest, w_hh_t, h0, c0
        )
        return jnp.sum(ys**2) + jnp.sum(hn * 0.5) + jnp.sum(cn * 0.25)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=tuple(range(6))))
    ref_val, ref_grads = grad_fn(xw0, w_ih_t, b_rest, w_hh_t, h0, c0)
    # batch dim of h0/c0 is axis 1 (torch layout) — shard xw0 on axis 0,
    # replicate the states (the wrapper transposes them internally)
    val, grads = grad_fn(
        _shard(mesh, xw0), w_ih_t, b_rest, w_hh_t, h0, c0
    )
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    names = ("dxw0", "dwih", "db", "dwhh", "dh0", "dc0")
    for a, b, name in zip(grads, ref_grads, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
        )


def test_mixer_stack_sharded_matches_unsharded():
    """The fused encoder-stack kernel under a batch-sharded mesh:
    forward and every gradient (incl. the LN/FFN grads reduced by
    outside einsums that GSPMD must psum) equal the unsharded run."""
    from multimodalreactiongeneration_tpu.ops import pallas_mixer_stack as pms

    mesh = _mesh()
    B, T, H, L = 16, 21, 8, 3
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    x0 = jax.random.normal(ks[0], (B, T, H)) * 0.5
    wih = jax.random.normal(ks[1], (L, H, 4 * H)) * 0.2
    bg = jax.random.normal(ks[2], (L, 4 * H)) * 0.1
    whh = jax.random.normal(ks[3], (L, H, 4 * H)) * 0.2
    wff = jax.random.normal(ks[4], (L, H, H)) * 0.2
    bff = jax.random.normal(ks[5], (L, H)) * 0.1
    g1 = jnp.ones((L, H)); b1 = jnp.zeros((L, H))
    g2 = jnp.ones((L, H)); b2 = jnp.zeros((L, H))
    h0 = jax.random.normal(ks[6], (L, B, H)) * 0.1
    c0 = jax.random.normal(ks[7], (L, B, H)) * 0.1

    def loss(*a):
        y, (hn, cn) = pms.mixer_stack_recurrence(*a)
        return jnp.sum(y**2) + jnp.sum(hn * 0.5) + jnp.sum(cn * 0.25)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=tuple(range(12))))
    args = (x0, wih, bg, whh, wff, bff, g1, b1, g2, b2, h0, c0)
    ref_val, ref_grads = grad_fn(*args)
    val, grads = grad_fn(_shard(mesh, x0), *args[1:])
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    names = ("dx0", "dwih", "dbg", "dwhh", "dwff", "dbff",
             "dg1", "db1", "dg2", "db2", "dh0", "dc0")
    for a, b, name in zip(grads, ref_grads, names):
        # rtol: the LN-scale grads are f32 sums over B x S whose
        # per-device psum reassociation shifts large-magnitude entries
        # by ~1e-5 relative
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=5e-4,
            err_msg=name,
        )


def test_lstm_sharded_large_batch_adaptive_chunk():
    """B=64 on the 8-device mesh: the GLOBAL batch picks chunk 8 while
    each local shard (b=8) blocks at 16 — output shapes must not depend
    on either (PAD_T-padded), or custom_partitioning's abstract eval and
    per-shard lowering disagree and compilation fails. T=21 makes
    pad-to-8 != pad-to-16. Regression for a real multi-chip defect."""
    from multimodalreactiongeneration_tpu.ops.partitioning import chunk_t

    mesh = _mesh()
    B, T, H = 64, 21, 8
    assert chunk_t(B) != chunk_t(B // 8)  # the mismatched regime
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    xw = jax.random.normal(ks[0], (B, T, 4 * H)) * 0.5
    w = jax.random.normal(ks[1], (H, 4 * H)) * 0.2
    h0 = jax.random.normal(ks[2], (B, H)) * 0.1
    c0 = jax.random.normal(ks[3], (B, H)) * 0.1

    def loss(xw, w, h0, c0):
        ys, (hn, cn) = pallas_lstm.lstm_recurrence(xw, w, h0, c0)
        return jnp.sum(ys**2) + jnp.sum(hn * 0.5) + jnp.sum(cn * 0.25)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    ref_val, ref_grads = grad_fn(xw, w, h0, c0)
    val, grads = grad_fn(
        _shard(mesh, xw), w, _shard(mesh, h0), _shard(mesh, c0)
    )
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    for a, b, name in zip(grads, ref_grads, ("dxw", "dw", "dh0", "dc0")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
        )
