"""Fixed-shape KV ring buffer for autoregressive decode under lax.scan.

TPU-native replacement for the reference's inference-time KV concat +
"truncation" (mixer_block.py:591-601): concatenation grows tensors every
step (shape-unstable, un-scannable) and its ``[-max_context_len:]`` slice
hits the batch dim, so the documented per-modality context budget
(lstmformer.py:102-110, config max_context_len seconds x rate) never
actually applied. Here the budget is enforced exactly: a capacity-C ring
buffer holds the most recent C keys/values; every shape is static so the
whole decode loop compiles to one lax.scan.

A cache is a plain pytree dict:
  {"k": (B, C, Dk), "v": (B, C, Dv), "length": int32 scalar}
``length`` counts total tokens ever appended (not clamped to C).

dtype=int8 stores QUANTIZED K/V with per-slot symmetric scales
("k_scale"/"v_scale", (B, C) f32): the resident ring buffers — the VMEM
working set carried across every decode step, the documented ceiling of
batch scaling — shrink another 2x below bf16. Incoming chunks are
quantized on write (amax/127 per token vector) and consumers receive
bf16 dequantized views, so the attention math is unchanged; error is
~0.4% per element (tests bound the end-to-end decode drift).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

KVCache = Dict[str, jnp.ndarray]

_SCALE_EPS = 1e-8  # zero vectors quantize to scale eps, not div-by-zero


def raw_cache_init(
    batch: int, capacity: int, dim: int, dtype=jnp.float32
) -> KVCache:
    """Ring buffer of RAW (pre-projection) tokens, ONE array.

    Backs the shared-KV decode layout (nn/attention.py attend_raw): all
    integrators of every metaformer block attend the same other-modality
    encodings, with each block's K/V projections folded into the query
    and output sides. Storing the single raw stream instead of
    per-(block, layer) projected K+V pairs shrinks the decode working
    set 2 x num_block x (copies of K and V) — at the production size
    (5 blocks, hidden 256) that is 92 MB -> 9.2 MB bf16 at batch 16,
    which keeps the whole attention state VMEM-resident.
    """
    return {
        "x": jnp.zeros((batch, capacity, dim), dtype),
        "length": jnp.zeros((), jnp.int32),
    }


def raw_cache_extend(
    cache: KVCache,
    chunk: jnp.ndarray,
    chunk_mask: Optional[jnp.ndarray] = None,
) -> Tuple[KVCache, jnp.ndarray, jnp.ndarray]:
    """Append (B, n, D) raw tokens; return (cache', x_full, mask).

    Mask semantics identical to cache_extend (True = masked): unwritten
    slots masked; ``chunk_mask`` ((..., Lq, n) bool) scatters intra-chunk
    causality onto the just-written slots when priming with a multi-token
    chunk (the leading warmup segment).
    """
    n = chunk.shape[1]
    capacity = cache["x"].shape[1]
    if n > capacity:
        raise ValueError(
            f"cannot extend a capacity-{capacity} raw cache with a "
            f"{n}-token chunk; raise max_context_len or shorten the "
            "priming segment"
        )
    length = cache["length"]
    pos = (length + jnp.arange(n, dtype=jnp.int32)) % capacity
    new_x = cache["x"].at[:, pos].set(chunk.astype(cache["x"].dtype))
    new_len = length + n
    valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(
        new_len, capacity
    )
    if chunk_mask is None:
        mask = ~valid[None, :]
    else:
        base = jnp.broadcast_to(~valid, chunk_mask.shape[:-1] + (capacity,))
        mask = base.at[..., pos].set(chunk_mask)
    return {"x": new_x, "length": new_len}, new_x, mask


def cache_init(
    batch: int,
    capacity: int,
    kdim: int,
    vdim: Optional[int] = None,
    dtype=jnp.float32,
) -> KVCache:
    vdim = kdim if vdim is None else vdim
    cache = {
        "k": jnp.zeros((batch, capacity, kdim), dtype),
        "v": jnp.zeros((batch, capacity, vdim), dtype),
        "length": jnp.zeros((), jnp.int32),
    }
    if dtype == jnp.int8:
        cache["k_scale"] = jnp.zeros((batch, capacity), jnp.float32)
        cache["v_scale"] = jnp.zeros((batch, capacity), jnp.float32)
    return cache


def _quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-token int8: (B, n, D) -> ((B, n, D) int8, (B, n) f32)."""
    x = x.astype(jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(x), axis=-1) / 127.0, _SCALE_EPS
    )
    q = jnp.round(x / scale[..., None]).astype(jnp.int8)
    return q, scale


def cache_extend(
    cache: KVCache,
    key: jnp.ndarray,
    value: jnp.ndarray,
    chunk_mask: Optional[jnp.ndarray] = None,
) -> Tuple[KVCache, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Append (B, n, D) new keys/values; return (cache', k, v, mask).

    The returned k/v are the full (B, C, D) buffers and ``mask`` is a bool
    attention mask (True = masked) over slots. Slot order is
    rotation-invariant for attention (softmax is permutation equivariant
    over keys), so no unrolling gather is needed.

    Without ``chunk_mask``: never-written slots are masked, everything
    else visible — correct for decode steps, whose queries are causally
    after all cached tokens and may see the whole within-step chunk
    (rectangular rule with q_len=1 masks nothing).

    With ``chunk_mask`` ((..., Lq, n) bool): used when PRIMING the cache
    with a multi-token chunk whose queries need intra-chunk causality
    (e.g. the leading warmup segment). The chunk mask is scattered onto
    the just-written slots; previously cached tokens stay visible (they
    precede every current query); unwritten slots stay masked.
    """
    n = key.shape[1]
    capacity = cache["k"].shape[1]
    if n > capacity:
        # modular scatter positions would collide and the stored K/V
        # would be nondeterministic; a longer prime than the context
        # budget is a config error, so fail at trace time
        raise ValueError(
            f"cannot extend a capacity-{capacity} KV cache with a "
            f"{n}-token chunk; raise max_context_len or shorten the "
            "priming segment"
        )
    length = cache["length"]
    pos = (length + jnp.arange(n, dtype=jnp.int32)) % capacity
    quantized = cache["k"].dtype == jnp.int8
    if quantized:
        qk, sk = _quantize(key)
        qv, sv = _quantize(value)
        new_k = cache["k"].at[:, pos].set(qk)
        new_v = cache["v"].at[:, pos].set(qv)
        new_ks = cache["k_scale"].at[:, pos].set(sk)
        new_vs = cache["v_scale"].at[:, pos].set(sv)
        # consumers get bf16 dequantized views; only the int8 buffers
        # and scales persist across steps in the scan carry
        k_out = new_k.astype(jnp.bfloat16) * new_ks[..., None].astype(
            jnp.bfloat16
        )
        v_out = new_v.astype(jnp.bfloat16) * new_vs[..., None].astype(
            jnp.bfloat16
        )
    else:
        new_k = cache["k"].at[:, pos].set(key.astype(cache["k"].dtype))
        new_v = cache["v"].at[:, pos].set(value.astype(cache["v"].dtype))
        k_out, v_out = new_k, new_v
    new_len = length + n
    valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(new_len, capacity)
    if chunk_mask is None:
        mask = ~valid[None, :]
    else:
        base = jnp.broadcast_to(
            ~valid, chunk_mask.shape[:-1] + (capacity,)
        )
        mask = base.at[..., pos].set(chunk_mask)
    new_cache = {"k": new_k, "v": new_v, "length": new_len}
    if quantized:
        new_cache["k_scale"] = new_ks
        new_cache["v_scale"] = new_vs
    return new_cache, k_out, v_out, mask
