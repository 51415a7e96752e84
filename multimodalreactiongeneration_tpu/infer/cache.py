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
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

KVCache = Dict[str, jnp.ndarray]


def cache_init(
    batch: int,
    capacity: int,
    kdim: int,
    vdim: Optional[int] = None,
    dtype=jnp.float32,
) -> KVCache:
    vdim = kdim if vdim is None else vdim
    return {
        "k": jnp.zeros((batch, capacity, kdim), dtype),
        "v": jnp.zeros((batch, capacity, vdim), dtype),
        "length": jnp.zeros((), jnp.int32),
    }


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
    new_k = cache["k"].at[:, pos].set(key.astype(cache["k"].dtype))
    new_v = cache["v"].at[:, pos].set(value.astype(cache["v"].dtype))
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
    return new_cache, new_k, new_v, mask
