"""Wavefront stacked-LSTM kernel vs a layer-by-layer scan (interpret).

The kernel pipelines all L layers along a wavefront diagonal
(ops/pallas_lstm_stacked.py); numerics must match running the torch
cell math layer-by-layer over the full sequence — the same ground truth
the single-layer kernel is held to.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from multimodalreactiongeneration_tpu.ops import pallas_lstm_stacked


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _setup(b=3, t=21, h=16, num_layers=3, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    xw0 = jax.random.normal(ks[0], (b, t, 4 * h)) * 0.5
    w_ih_t = jax.random.normal(ks[1], (num_layers - 1, h, 4 * h)) * 0.2
    b_rest = jax.random.normal(ks[2], (num_layers - 1, 4 * h)) * 0.1
    w_hh_t = jax.random.normal(ks[3], (num_layers, h, 4 * h)) * 0.2
    h0 = jax.random.normal(ks[4], (num_layers, b, h)) * 0.1
    c0 = jax.random.normal(ks[5], (num_layers, b, h)) * 0.1
    return xw0, w_ih_t, b_rest, w_hh_t, h0, c0


def _scan_stack_ref(xw0, w_ih_t, b_rest, w_hh_t, h0, c0):
    """Layer-by-layer lax.scan ground truth with torch cell math."""

    def layer(xw, wt, h, c):
        def step(carry, xt):
            h, c = carry
            g = xt + h @ wt
            i, f, gg, o = jnp.split(g, 4, -1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (hn, cn), ys = jax.lax.scan(step, (h, c), jnp.swapaxes(xw, 0, 1))
        return jnp.swapaxes(ys, 0, 1), hn, cn

    num_layers = w_hh_t.shape[0]
    x = xw0
    hns, cns = [], []
    for l in range(num_layers):
        if l > 0:
            x = (
                jnp.einsum("bth,hg->btg", x, w_ih_t[l - 1])
                + b_rest[l - 1]
            )
        ys, hn, cn = layer(x, w_hh_t[l], h0[l], c0[l])
        hns.append(hn)
        cns.append(cn)
        x = ys
    return ys, jnp.stack(hns), jnp.stack(cns)


@pytest.mark.parametrize("num_layers,t", [(2, 16), (3, 21), (5, 40)])
def test_forward_matches_layer_by_layer(num_layers, t):
    args = _setup(t=t, num_layers=num_layers)
    ys, (hn, cn) = pallas_lstm_stacked.lstm_stacked_recurrence(*args)
    ys_ref, hn_ref, cn_ref = _scan_stack_ref(*args)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hn_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref), atol=1e-5)


@pytest.mark.parametrize("num_layers,t", [(2, 16), (3, 21), (5, 33)])
def test_gradients_match_layer_by_layer(num_layers, t):
    args = _setup(t=t, num_layers=num_layers, seed=1)

    def loss_wave(*a):
        ys, (hn, cn) = pallas_lstm_stacked.lstm_stacked_recurrence(*a)
        return jnp.sum(ys**2) + jnp.sum(hn * 0.5) + jnp.sum(cn * 0.25)

    def loss_ref(*a):
        ys, hn, cn = _scan_stack_ref(*a)
        return jnp.sum(ys**2) + jnp.sum(hn * 0.5) + jnp.sum(cn * 0.25)

    argnums = tuple(range(6))
    g_w = jax.grad(loss_wave, argnums=argnums)(*args)
    g_s = jax.grad(loss_ref, argnums=argnums)(*args)
    names = ("dxw0", "dwih", "db", "dwhh", "dh0", "dc0")
    for a, b, name in zip(g_w, g_s, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, err_msg=name
        )


def test_single_step_sequences():
    # T=1 exercises every validity edge: layer l's only valid slot is l
    args = _setup(t=1, num_layers=4, seed=2)
    ys, (hn, cn) = pallas_lstm_stacked.lstm_stacked_recurrence(*args)
    ys_ref, hn_ref, cn_ref = _scan_stack_ref(*args)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hn_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref), atol=1e-5)


def test_bf16_weights_track_f32():
    xw0, w_ih_t, b_rest, w_hh_t, h0, c0 = _setup(t=24, num_layers=3, seed=3)
    ys32, _ = pallas_lstm_stacked.lstm_stacked_recurrence(
        xw0, w_ih_t, b_rest, w_hh_t, h0, c0
    )
    ys16, _ = pallas_lstm_stacked.lstm_stacked_recurrence(
        xw0,
        w_ih_t.astype(jnp.bfloat16),
        b_rest,
        w_hh_t.astype(jnp.bfloat16),
        h0,
        c0,
    )
    assert ys16.dtype == jnp.float32  # state stays f32
    np.testing.assert_allclose(
        np.asarray(ys32), np.asarray(ys16), atol=5e-2
    )


def test_torchlstm_stacked_path_matches_scan(monkeypatch):
    """TorchLSTM(num_layers>1) on the pallas path must route through the
    wavefront kernel and equal the scan path bit-for-tolerance, states
    included (torch (L, B, H) layout)."""
    from multimodalreactiongeneration_tpu.nn.recurrent import TorchLSTM

    b, t, h, L = 3, 24, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, 12))
    h0 = jax.random.normal(jax.random.PRNGKey(1), (L, b, h)) * 0.1
    c0 = jax.random.normal(jax.random.PRNGKey(2), (L, b, h)) * 0.1

    scan_mod = TorchLSTM(input_size=12, hidden_size=h, num_layers=L,
                         impl="scan")
    pallas_mod = TorchLSTM(input_size=12, hidden_size=h, num_layers=L,
                           impl="pallas")
    params = scan_mod.init(jax.random.PRNGKey(3), x)

    ys_s, (hn_s, cn_s) = scan_mod.apply(params, x, (h0, c0))
    ys_p, (hn_p, cn_p) = pallas_mod.apply(params, x, (h0, c0))
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_p), np.asarray(hn_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn_p), np.asarray(cn_s), atol=1e-5)

    # gradients through the module (params + input)
    def loss(mod):
        def f(p, x):
            ys, (hn, cn) = mod.apply(p, x, (h0, c0))
            return jnp.sum(ys**2) + jnp.sum(hn) + jnp.sum(cn * 0.5)
        return f

    g_s = jax.grad(loss(scan_mod), argnums=(0, 1))(params, x)
    g_p = jax.grad(loss(pallas_mod), argnums=(0, 1))(params, x)
    flat_s = jax.tree_util.tree_leaves_with_path(g_s)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    for (path_s, a), (_, b_) in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=3e-4,
            err_msg=jax.tree_util.keystr(path_s),
        )
