"""Mixer family: shapes, state threading, KV-cache decode equivalence."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.infer.cache import cache_extend, cache_init
from multimodalreactiongeneration_tpu.nn.mixers import (
    MHAMixerBlock,
    MHAMixerLayerd,
    MLPMixerLayerd,
    RecurrentMixerLayerd,
)
from multimodalreactiongeneration_tpu.ops.masks import rectangular_causal_mask


pytestmark = pytest.mark.slow
KEY = jax.random.PRNGKey(0)


def test_mlp_layerd_shape():
    m = MLPMixerLayerd(hidden_size=16, num_layerd=2, nonlinearity="relu",
                       residual=True, residual_layer_norm=True)
    x = jnp.ones((2, 5, 16))
    params = m.init(KEY, x)
    y, st = m.apply(params, x)
    assert y.shape == x.shape and st is None


def test_recurrent_layerd_state_threading():
    m = RecurrentMixerLayerd(hidden_size=8, kind="lstm", num_layerd=2,
                             residual=True, residual_layer_norm=True)
    x1 = jax.random.normal(KEY, (2, 6, 8))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8))
    params = m.init(KEY, x1)

    # split processing with carried state == concatenated processing
    y_full, _ = m.apply(params, jnp.concatenate([x1, x2], axis=1))
    y1, st = m.apply(params, x1)
    y2, st2 = m.apply(params, x2, st)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)),
        np.asarray(y_full),
        atol=1e-5,
    )
    assert len(st2) == 2  # fresh states returned (reference drops them)


def test_mha_cached_decode_matches_full_causal_attention():
    """Step-by-step self-attention with the KV ring buffer must equal
    full-sequence attention under a standard causal mask."""
    T, E = 6, 8
    m = MHAMixerBlock(hidden_size=E, num_heads=2, residual=True,
                      residual_layer_norm=True)
    x = jax.random.normal(KEY, (1, T, E))
    params = m.init(KEY, x, x, x)

    causal = rectangular_causal_mask(T, T)
    y_full, _ = m.apply(params, x, x, x, causal, None)

    cache = [cache_init(1, capacity=16, kdim=E)]
    ys = []
    for t in range(T):
        xt = x[:, t : t + 1]
        yt, cache = m.apply(params, xt, xt, xt, None, cache)
        ys.append(yt)
    y_step = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_full), atol=1e-5)


def test_mha_cache_ring_truncation():
    """With capacity C < T the cache must only expose the last C tokens."""
    T, E, C = 8, 4, 3
    cache = cache_init(1, capacity=C, kdim=E)
    keys = jax.random.normal(KEY, (1, T, E))
    for t in range(T):
        cache, k, v, mask = cache_extend(cache, keys[:, t : t + 1], keys[:, t : t + 1])
    assert int(cache["length"]) == T
    assert not mask.any()  # all slots valid after wrap
    # buffer holds exactly the last C keys (order-insensitive)
    held = np.sort(np.asarray(k[0]), axis=0)
    want = np.sort(np.asarray(keys[0, -C:]), axis=0)
    np.testing.assert_allclose(held, want, atol=1e-6)


def test_mha_layerd_cross_attention_shape():
    m = MHAMixerLayerd(hidden_size=8, num_heads=2, num_layerd=2,
                       residual=True, residual_layer_norm=True)
    q = jnp.ones((2, 4, 8))
    kv = jnp.ones((2, 12, 8))
    mask = rectangular_causal_mask(4, 12)
    params = m.init(KEY, q, kv, kv, mask)
    y, caches = m.apply(params, q, kv, kv, mask)
    assert y.shape == (2, 4, 8)
    assert len(caches) == 2 and caches[0] is None
