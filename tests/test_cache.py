"""KV ring buffer property tests (infer/cache.py).

The buffer's contract: after any sequence of extends, attention over
(buffer, mask) equals attention over the plain concatenation's last
``capacity`` tokens — softmax attention is permutation-equivariant over
keys, so slot rotation must not matter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalreactiongeneration_tpu.infer.cache import (
    cache_extend,
    cache_init,
)
from multimodalreactiongeneration_tpu.nn.attention import (
    scaled_dot_attention,
)


def _attend(q, k, v, mask):
    # (B, S, D) single-head attention; mask (..., S) True = masked
    qh = q[:, None]  # (B, 1=head, 1, D)
    kh = k[:, None]
    vh = v[:, None]
    m = jnp.broadcast_to(mask[:, None, None, :], qh.shape[:3] + (k.shape[1],)) \
        if mask.ndim == 2 else mask
    return scaled_dot_attention(qh, kh, vh, m)[:, 0]


@pytest.mark.parametrize("capacity", [7, 16])
def test_ring_buffer_equals_truncated_concat(capacity):
    rng = np.random.default_rng(0)
    batch, dim = 2, 8
    cache = cache_init(batch, capacity, dim)
    naive_k, naive_v = [], []

    for step, n in enumerate([3, 1, 5, 2, 7, 1, 4, 6, 1, 1]):
        k = jnp.asarray(rng.normal(size=(batch, n, dim)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(batch, n, dim)), jnp.float32)
        cache, k_full, v_full, mask = cache_extend(cache, k, v)
        naive_k.append(np.asarray(k))
        naive_v.append(np.asarray(v))

        ref_k = np.concatenate(naive_k, axis=1)[:, -capacity:]
        ref_v = np.concatenate(naive_v, axis=1)[:, -capacity:]
        q = jnp.asarray(rng.normal(size=(batch, 1, dim)), jnp.float32)

        got = _attend(q, k_full, v_full, jnp.broadcast_to(
            mask, (batch,) + mask.shape[-1:]
        ))
        want = _attend(
            q, jnp.asarray(ref_k), jnp.asarray(ref_v),
            jnp.zeros((batch, ref_k.shape[1]), bool),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5,
            err_msg=f"step {step} (length {int(cache['length'])})",
        )


def test_overflow_chunk_raises():
    cache = cache_init(1, 4, 8)
    with pytest.raises(ValueError, match="capacity-4"):
        cache_extend(
            cache, jnp.zeros((1, 5, 8)), jnp.zeros((1, 5, 8))
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_prime_chunk_mask_scatter(dtype):
    """Priming with an intra-chunk causal mask: query i of the chunk must
    not see chunk tokens > i, while earlier cached tokens stay visible.
    The mask logic is dtype-independent (int8 quantization only touches
    the stored values)."""
    capacity, dim = 8, 4
    cache = cache_init(1, capacity, dim, dtype=dtype)
    # first: 2 plain tokens (all visible to later queries)
    cache, _, _, _ = cache_extend(
        cache, jnp.ones((1, 2, dim)), jnp.ones((1, 2, dim))
    )
    # then: prime a 3-token chunk with causal intra-chunk masking
    chunk_mask = jnp.triu(jnp.ones((3, 3), bool), k=1)[None]  # (1, Lq=3, 3)
    cache, _, _, mask = cache_extend(
        cache, jnp.ones((1, 3, dim)), jnp.ones((1, 3, dim)),
        chunk_mask=chunk_mask,
    )
    mask = np.asarray(mask)  # (1, 3, capacity)
    # slots 0-1 (pre-existing) visible to every chunk query
    assert not mask[0, :, :2].any()
    # chunk slots 2-4: causal
    assert not mask[0, 0, 2] and mask[0, 0, 3] and mask[0, 0, 4]
    assert not mask[0, 1, 3] and mask[0, 1, 4]
    assert not mask[0, 2, 4]
    # never-written slots masked for every query
    assert mask[0, :, 5:].all()


@pytest.mark.parametrize("capacity", [7, 16])
def test_int8_ring_buffer_tracks_f32(capacity):
    """dtype=int8 stores quantized K/V + per-slot scales; the dequantized
    views must track the f32 buffer within symmetric-int8 error (~0.4%
    per element) through arbitrary extend/rotation sequences, with
    identical masks and ring semantics."""
    rng = np.random.default_rng(1)
    batch, dim = 2, 8
    c8 = cache_init(batch, capacity, dim, dtype=jnp.int8)
    c32 = cache_init(batch, capacity, dim)
    assert c8["k"].dtype == jnp.int8 and "k_scale" in c8

    for n in [3, 1, 5, 2, 7, 1, 4, 6]:
        k = jnp.asarray(rng.normal(size=(batch, n, dim)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(batch, n, dim)), jnp.float32)
        c8, k8, v8, m8 = cache_extend(c8, k, v)
        c32, k32, v32, m32 = cache_extend(c32, k, v)
        np.testing.assert_array_equal(np.asarray(m8), np.asarray(m32))
        assert k8.dtype == jnp.bfloat16  # dequantized view
        # written slots track f32 within int8 + bf16 rounding; compare
        # only valid slots (unwritten are zeros in both)
        scale = np.max(np.abs(np.asarray(k32)), axis=-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(k8, np.float32), np.asarray(k32),
            atol=1e-6 + float(scale.max()) * 0.012,
        )
        np.testing.assert_allclose(
            np.asarray(v8, np.float32), np.asarray(v32),
            atol=1e-6 + float(np.abs(np.asarray(v32)).max()) * 0.012,
        )

    # attention over the int8 view stays close to the f32 attention
    q = jnp.asarray(rng.normal(size=(batch, 1, dim)), jnp.float32)
    got = _attend(q, k8.astype(jnp.float32), v8.astype(jnp.float32),
                  jnp.broadcast_to(m8, (batch,) + m8.shape[-1:]))
    want = _attend(q, k32, v32,
                   jnp.broadcast_to(m32, (batch,) + m32.shape[-1:]))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.03
    )


def test_int8_zero_vectors_are_exact():
    # all-zero tokens must quantize to exactly zero (scale eps, no NaN)
    cache = cache_init(1, 4, 8, dtype=jnp.int8)
    cache, k, v, _ = cache_extend(
        cache, jnp.zeros((1, 2, 8)), jnp.zeros((1, 2, 8))
    )
    assert np.isfinite(np.asarray(k, np.float32)).all()
    np.testing.assert_array_equal(np.asarray(k, np.float32)[:, :2], 0.0)


def test_raw_cache_matches_kv_cache_ring_arithmetic():
    """raw_cache_extend (single-array, shared-KV decode) must produce
    the same ring positions, contents and masks as cache_extend."""
    from multimodalreactiongeneration_tpu.infer.cache import (
        raw_cache_extend,
        raw_cache_init,
    )

    rng = np.random.default_rng(3)
    batch, dim, capacity = 2, 8, 7
    kv = cache_init(batch, capacity, dim)
    raw = raw_cache_init(batch, capacity, dim)
    for n in [3, 1, 5, 2, 7, 1, 4]:
        chunk = jnp.asarray(rng.standard_normal((batch, n, dim)), jnp.float32)
        kv, k_full, _, m_kv = cache_extend(kv, chunk, chunk)
        raw, x_full, m_raw = raw_cache_extend(raw, chunk)
        np.testing.assert_array_equal(np.asarray(m_kv), np.asarray(m_raw))
        np.testing.assert_allclose(
            np.asarray(x_full), np.asarray(k_full), atol=0
        )
        assert int(raw["length"]) == int(kv["length"])


def test_raw_cache_overflow_and_prime_mask():
    from multimodalreactiongeneration_tpu.infer.cache import (
        raw_cache_extend,
        raw_cache_init,
    )

    raw = raw_cache_init(1, 4, 2)
    with pytest.raises(ValueError):
        raw_cache_extend(raw, jnp.zeros((1, 5, 2)))

    # prime a 3-token chunk with an intra-chunk causal mask: scattered
    # onto written slots, unwritten slot stays masked
    causal = jnp.triu(jnp.ones((3, 3), bool), k=1)[None]
    _, _, mask = raw_cache_extend(raw, jnp.ones((1, 3, 2)), chunk_mask=causal)
    assert mask.shape == (1, 3, 4)
    np.testing.assert_array_equal(
        np.asarray(mask[0, :, :3]), np.asarray(causal[0])
    )
    assert bool(mask[0, :, 3].all())  # unwritten slot masked for all queries
