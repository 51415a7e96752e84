"""Fused recurrent-mixer stack kernel vs the unfused flax modules.

Ground truth is RecurrentMixerLayerd itself on the scan path — the
kernel must reproduce the full block semantics (LSTM + residual + LN +
Dense + residual + LN per block) including gradients, at the production
flags (residual=True, residual_layer_norm=True, nonlinearity=None,
use_bias=True, dropout=0).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from multimodalreactiongeneration_tpu.nn.mixers import RecurrentMixerLayerd
from multimodalreactiongeneration_tpu.ops import pallas_mixer_stack


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _module(num_layerd, h):
    return RecurrentMixerLayerd(
        hidden_size=h,
        kind="lstm",
        num_layerd=num_layerd,
        num_internal_layer=1,
        dropout=0.0,
        bidirectional=False,
        nonlinearity=None,
        residual=True,
        residual_layer_norm=True,
        bottleneck_size=16,  # unused when nonlinearity is None
        use_bias=True,
    )


def _extract(params, num_layerd):
    """Pull the kernel's stacked weight arrays out of the module tree."""
    w_ih, b_g, w_hh, w_ff, b_ff, g1, b1, g2, b2 = (
        [], [], [], [], [], [], [], [], []
    )
    for i in range(num_layerd):
        blk = params["params"][f"block_{i}"]
        w_ih.append(blk["mixer"]["weight_ih_l0"].T)
        w_hh.append(blk["mixer"]["weight_hh_l0"].T)
        b_g.append(blk["mixer"]["bias_ih_l0"] + blk["mixer"]["bias_hh_l0"])
        g1.append(blk["mixer_norm"]["scale"])
        b1.append(blk["mixer_norm"]["bias"])
        w_ff.append(blk["feed_forward"]["feedforward"]["kernel"])
        b_ff.append(blk["feed_forward"]["feedforward"]["bias"])
        g2.append(blk["feed_forward"]["LayerNorm_0"]["scale"])
        b2.append(blk["feed_forward"]["LayerNorm_0"]["bias"])
    st = lambda xs: jnp.stack(xs)
    return (st(w_ih), st(b_g), st(w_hh), st(w_ff), st(b_ff),
            st(g1), st(b1), st(g2), st(b2))


@pytest.mark.parametrize("num_layerd,t", [(2, 16), (3, 21), (5, 33)])
def test_forward_matches_module(num_layerd, t):
    b, h = 3, 16
    mod = _module(num_layerd, h)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, h))
    params = mod.init(jax.random.PRNGKey(1), x)
    y_ref, states_ref = mod.apply(params, x)

    stacked = _extract(params, num_layerd)
    h0 = jnp.zeros((num_layerd, b, h))
    y, (hn, cn) = pallas_mixer_stack.mixer_stack_recurrence(
        x, stacked[0], stacked[1], stacked[2], stacked[3], stacked[4],
        stacked[5], stacked[6], stacked[7], stacked[8], h0, h0,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    for l, (hr, cr) in enumerate(states_ref):
        np.testing.assert_allclose(
            np.asarray(hn[l]), np.asarray(hr[0]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(cn[l]), np.asarray(cr[0]), atol=2e-5
        )


@pytest.mark.parametrize("num_layerd,t", [(2, 16), (3, 21)])
def test_gradients_match_module(num_layerd, t):
    b, h = 3, 16
    mod = _module(num_layerd, h)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, h))
    params = mod.init(jax.random.PRNGKey(3), x)
    tgt = jax.random.normal(jax.random.PRNGKey(4), (b, t, h))

    def loss_ref(p, x):
        y, states = mod.apply(p, x)
        s = sum(jnp.sum(hh) + 0.5 * jnp.sum(cc) for hh, cc in states)
        return jnp.sum((y - tgt) ** 2) + s

    def loss_kernel(p, x):
        st = _extract(p, num_layerd)
        h0 = jnp.zeros((num_layerd, b, h))
        y, (hn, cn) = pallas_mixer_stack.mixer_stack_recurrence(
            x, st[0], st[1], st[2], st[3], st[4], st[5], st[6], st[7],
            st[8], h0, h0,
        )
        return jnp.sum((y - tgt) ** 2) + jnp.sum(hn) + 0.5 * jnp.sum(cn)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_ker = jax.grad(loss_kernel, argnums=(0, 1))(params, x)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_k = jax.tree_util.tree_leaves_with_path(g_ker)
    for (path, a), (_, b_) in zip(flat_r, flat_k):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_nonzero_initial_states():
    """Streaming warmup semantics: non-zero h0/c0 must thread through
    every block exactly like calling the modules with per-block hx."""
    b, h, L, t = 2, 16, 3, 17
    mod = _module(L, h)
    x = jax.random.normal(jax.random.PRNGKey(5), (b, t, h))
    params = mod.init(jax.random.PRNGKey(6), x)
    h0 = jax.random.normal(jax.random.PRNGKey(7), (L, b, h)) * 0.3
    c0 = jax.random.normal(jax.random.PRNGKey(8), (L, b, h)) * 0.3

    hx = [(h0[l][None], c0[l][None]) for l in range(L)]
    y_ref, _ = mod.apply(params, x, hx)
    st = _extract(params, L)
    y, _ = pallas_mixer_stack.mixer_stack_recurrence(
        x, st[0], st[1], st[2], st[3], st[4], st[5], st[6], st[7], st[8],
        h0, c0,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_layerd_fused_path_matches_unfused(monkeypatch):
    """RecurrentMixerLayerd must route through the fused kernel when the
    production flags apply (MRGEN_RNN_IMPL=pallas) and match the unfused
    path — params created at IDENTICAL tree paths on both, so one init
    serves both."""
    import os
    from multimodalreactiongeneration_tpu.ops import pallas_mixer_stack as pms

    b, h, L, t = 2, 16, 3, 20
    mod = _module(L, h)
    x = jax.random.normal(jax.random.PRNGKey(9), (b, t, h))
    params = mod.init(jax.random.PRNGKey(10), x)  # unfused init (scan)
    y_ref, states_ref = mod.apply(params, x)

    calls = []
    orig = pms.mixer_stack_recurrence
    monkeypatch.setattr(
        pms, "mixer_stack_recurrence",
        lambda *a: (calls.append(1), orig(*a))[1],
    )
    monkeypatch.setenv("MRGEN_RNN_IMPL", "pallas")
    monkeypatch.setenv("MRGEN_FUSED_ENCODER", "1")
    y_f, states_f = mod.apply(params, x)
    assert calls, "fused path did not engage"
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref), atol=2e-5)
    for (hr, cr), (hf, cf) in zip(states_ref, states_f):
        np.testing.assert_allclose(np.asarray(hf), np.asarray(hr), atol=2e-5)
        np.testing.assert_allclose(np.asarray(cf), np.asarray(cr), atol=2e-5)

    # a FUSED-path init must produce the identical param tree (paths,
    # shapes, and values — flax derives param rngs from the path)
    params_fused_init = mod.init(jax.random.PRNGKey(10), x)
    ref_flat = jax.tree_util.tree_leaves_with_path(params)
    fus_flat = jax.tree_util.tree_leaves_with_path(params_fused_init)
    assert len(ref_flat) == len(fus_flat)
    for (pr, vr), (pf, vf) in zip(ref_flat, fus_flat):
        assert jax.tree_util.keystr(pr) == jax.tree_util.keystr(pf)
        np.testing.assert_array_equal(np.asarray(vr), np.asarray(vf))


def test_layerd_fused_path_bf16_params(monkeypatch):
    """bf16 params (the mixed-precision train cast) through the fused
    path: weights select bf16 matmuls, f32 state — outputs must track
    the unfused bf16 path within bf16 tolerance and keep x's dtype."""
    from multimodalreactiongeneration_tpu.train.harness import _cast_tree

    b, h, L, t = 2, 16, 3, 20
    mod = _module(L, h)
    x = jax.random.normal(jax.random.PRNGKey(12), (b, t, h))
    params = mod.init(jax.random.PRNGKey(13), x)
    p16 = _cast_tree(params, jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)

    y_ref, _ = mod.apply(p16, x16)  # unfused (scan) bf16
    monkeypatch.setenv("MRGEN_RNN_IMPL", "pallas")
    monkeypatch.setenv("MRGEN_FUSED_ENCODER", "1")
    y_f, _ = mod.apply(p16, x16)
    assert y_f.dtype == x16.dtype
    np.testing.assert_allclose(
        np.asarray(y_f, np.float32), np.asarray(y_ref, np.float32),
        atol=0.15,  # bf16 scan carries vs f32-state kernel: both ~2^-8
    )
