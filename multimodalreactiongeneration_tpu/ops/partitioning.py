"""Batch-dim SPMD partitioning for the Pallas kernels.

GSPMD cannot auto-partition a Mosaic custom call, so under a multi-chip
mesh a batch-sharded activation reaching ops/pallas_lstm.py /
ops/pallas_gru.py would force a compile error or an implicit full
regather. The kernels ARE embarrassingly parallel over the batch dim,
though — `shard_batch_dim` wraps them with jax.experimental
custom_partitioning: each device runs the unmodified kernel on its local
batch shard, weights stay replicated, and cross-batch reductions (weight
gradients in the backward kernels) are psum'd over the batch mesh axes
inside the partitioned lowering.

This is the pjit-native equivalent of wrapping each call site in
shard_map, done once at the kernel boundary so models never plumb mesh
objects.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_batch_dim(
    fn: Callable,
    batch_args: Sequence[int],
    out_is_batched: Sequence[bool],
    reduce_outs: Sequence[int] = (),
    sharding_rule: str = None,
):
    """Wrap ``fn`` so pjit shards it over the batch dimension.

    The dim-0 special case of `shard_any_dim` (the RNN kernels carry
    batch at dim 0 everywhere).

    batch_args: positions of args whose dim 0 is the batch (everything
    else is treated as replicated — weights/biases).
    out_is_batched: per flat output, True if its dim 0 is the batch.
    reduce_outs: flat output positions that are SUMS over the batch
    (weight grads) — psum'd over the batch axis in the lowering.
    sharding_rule: einsum-like SdyShardingRule string (required by the
    Shardy partitioner, e.g. "b t g, h g, b h, b h -> b t h, b h");
    the shared leading factor must be the batch.
    """
    batch_args = frozenset(batch_args)
    out_is_batched = tuple(out_is_batched)
    return shard_any_dim(
        fn,
        lambda i: 0 if i in batch_args else None,
        lambda j: 0 if out_is_batched[j] else None,
        reduce_outs=reduce_outs,
        sharding_rule=sharding_rule,
    )


def make_sharding_rule(arg_dims, out_dims) -> str:
    """Autogenerate a Shardy rule string for `shard_any_dim`.

    arg_dims / out_dims: sequences of (ndim, batch_dim-or-None). The
    batch dim maps to the shared factor ``b``; every other dim gets a
    fresh private factor (multi-char factor names are valid Shardy
    grammar)."""

    def term(prefix, i, nd, dim):
        return " ".join(
            "b" if j == dim else f"{prefix}{i}_{j}" for j in range(nd)
        )

    lhs = ", ".join(
        term("a", i, nd, d) for i, (nd, d) in enumerate(arg_dims)
    )
    rhs = ", ".join(
        term("o", i, nd, d) for i, (nd, d) in enumerate(out_dims)
    )
    return f"{lhs} -> {rhs}"


def shard_any_dim(
    fn: Callable,
    arg_batch_dims,
    out_batch_dims,
    reduce_outs: Sequence[int] = (),
    sharding_rule: str = None,
):
    """Per-operand batch-dim custom_partitioning (the general core).

    The decode-rollout kernel (ops/pallas_decode_rollout.py) carries the
    batch at dim 0 (caches), dim 1 (per-step streams (T, B, ...) and
    stacked LSTM state (NB, B, H)) or nowhere (weights, the sampling
    mask); the RNN kernels carry it at dim 0 everywhere
    (`shard_batch_dim`, a thin delegate of this function).

    arg_batch_dims / out_batch_dims: one entry per (flat) operand /
    output — the dimension holding the batch, or None for replicated.
    Either a sequence or a Callable[[index], dim-or-None].
    reduce_outs: flat output positions that are SUMS over the batch
    (weight grads) — psum'd over the batch axis in the lowering.
    sharding_rule: Shardy rule string; build with `make_sharding_rule`.
    """
    if not callable(arg_batch_dims):
        _ad = tuple(arg_batch_dims)
        arg_batch_dims = lambda i: _ad[i]  # noqa: E731
    if not callable(out_batch_dims):
        _od = tuple(out_batch_dims)
        out_batch_dims = lambda j: _od[j]  # noqa: E731
    reduce_outs = tuple(reduce_outs)

    wrapped = custom_partitioning(fn)

    def _axis(arg_shapes):
        for i, s in enumerate(arg_shapes):
            d = arg_batch_dims(i)
            if d is None:
                continue
            spec = getattr(s.sharding, "spec", None)
            if spec and len(spec) > d and spec[d] is not None:
                return spec[d]
        return None

    def _spec(nd, dim, axis):
        parts = [None] * nd
        if axis is not None and dim is not None:
            parts[dim] = axis
        return P(*parts)

    def _shardings(mesh, arg_shapes, result_shape, axis):
        args = tuple(
            NamedSharding(mesh, _spec(len(s.shape), arg_batch_dims(i), axis))
            for i, s in enumerate(arg_shapes)
        )
        flat_res, treedef = jax.tree_util.tree_flatten(result_shape)
        res = [
            NamedSharding(mesh, _spec(len(s.shape), out_batch_dims(j), axis))
            for j, s in enumerate(flat_res)
        ]
        return args, jax.tree_util.tree_unflatten(treedef, res)

    def infer_sharding(mesh, arg_shapes, result_shape):
        _, res = _shardings(
            mesh, arg_shapes, result_shape, _axis(arg_shapes)
        )
        return res

    def partition(mesh, arg_shapes, result_shape):
        axis = _axis(arg_shapes)
        arg_sh, res_sh = _shardings(mesh, arg_shapes, result_shape, axis)

        def lower_fn(*args):
            out = fn(*args)
            if axis is not None and reduce_outs:
                flat, treedef = jax.tree_util.tree_flatten(out)
                for j in reduce_outs:
                    flat[j] = jax.lax.psum(flat[j], axis)
                out = jax.tree_util.tree_unflatten(treedef, flat)
            return out

        return mesh, lower_fn, res_sh, arg_sh

    kwargs = {}
    if sharding_rule is not None:
        kwargs["sharding_rule"] = sharding_rule
    wrapped.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        **kwargs,
    )
    return wrapped


def chunk_t(batch: int) -> int:
    """Time-chunk length for the recurrence kernels, scaled to batch.

    The chunked VMEM working set (xw/gates/ys/cs blocks, double-buffered
    by the Pallas pipeline) grows as batch x chunk: B64 x chunk16 at
    H256 was an observed compile OOM against the 16 MB scoped-VMEM
    compiler default (the kernels now also raise that cap to 64 MB via
    CompilerParams). 8 is the hardware floor — Mosaic requires the
    second-minor block dim divisible by 8.

    IMPORTANT: callers pad time with the batch-INDEPENDENT PAD_T = 16
    (every chunk divides it); keying padded OUTPUT shapes on this
    function would break custom_partitioning, whose abstract eval sees
    the global batch while the lowering sees the local shard.

    MRGEN_CHUNK_T overrides the heuristic for A/B experiments (must
    divide PAD_T: 8 or 16)."""
    import os

    override = os.environ.get("MRGEN_CHUNK_T")
    if override:
        return int(override)
    return 16 if batch <= 32 else 8


def pad_axis(x, axis: int, size: int):
    """Zero-pad ``axis`` up to ``size`` (shared by the wavefront
    kernels' slot-space layouts)."""
    import jax.numpy as jnp

    pad = size - x.shape[axis]
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        x = jnp.pad(x, cfg)
    return x


def slot_pad_len(t: int, num_layers: int, chunk: int, lag: int = 1) -> int:
    """Padded slot-space length for a wavefront: layer l's time t sits
    at slot t + l*lag; total slots = t + (L-1)*lag rounded up to the
    chunk."""
    s = t + (num_layers - 1) * lag
    return s + (-s) % chunk


def pad_time(x, tc):
    """Pad axis 1 up to a multiple of tc (the kernels' time chunk).

    Shared by the Pallas LSTM/GRU recurrences (identical padding rule;
    keeping one copy prevents the twins drifting apart)."""
    import jax.numpy as jnp

    t = x.shape[1]
    pad = (-t) % tc
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, t
