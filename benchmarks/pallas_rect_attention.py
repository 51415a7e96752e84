"""Pallas TPU kernel: rectangular cross-rate causal attention.

DEMOTED FROM THE MODEL PATH (kept as a benchmark/reference kernel): it
beats the masked-XLA attention ~13.7x standalone at (B128, H4, 256x2048),
but wired into the metaformer it measured NET-NEUTRAL-TO-NEGATIVE on a
real v5e — full train step (fwd+bwd, hidden 256 x 5 blocks, lstm
embeddings) 38.7 ms XLA vs 39.1 ms pallas at B16/T224 and 75.4 vs 80.0 ms
at B32/T240 (2026-08-16, median-of-slopes timing). Attention is a small
share of the step at production sizes and the pallas_call boundary
breaks XLA's fusion of attention with the surrounding projections, which
costs more than the in-kernel mask saves. Revisit if a model config makes
cross-attention dominant (mha embeddings at long context).

The metaformer's cross-modal attention uses the rectangular causal rule
``key j is masked for query i  <=>  j*Lq >= (i+1)*Lk`` plus a padding
pair mask (ops/masks.py). The XLA path materializes (B, H, Lq, Lk)
logits + mask in HBM — at training size (B=128, H=4, Lq=250, Lk=2000)
that is ~1 GB per attention layer of mask+logits traffic.

This kernel computes the predicate IN-KERNEL from broadcasted iotas and
keeps each (q-block, full-K) logits tile in VMEM: per program the
working set is ~2.5 MB (q block 128xD, K/V LkxD, logits 128xLk), nothing
rank-4 ever touches HBM. Grid = (B*H, Lq/BLOCK_Q); K/V fit VMEM whole at
this model's context budgets (<= 2000 x 64).

Numerics match nn/attention.scaled_dot_attention bit-for-semantics:
f32 logits, finite -1e30 for masked entries (fully-masked rows degrade
to a uniform average, never NaN).

Differentiable via custom_vjp: the backward pass recomputes attention
with standard XLA ops (fwd stays memory-light; bwd pays the
materialization only where autodiff needs it anyway).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BLOCK_Q = 128


def _kernel(qpad_ref, kpad_ref, q_ref, k_ref, v_ref, o_ref, *, lq, lk, scale):
    qb = pl.program_id(1)
    q = q_ref[0]  # (BLOCK_Q, D)
    k = k_ref[0]  # (Lk, D)
    v = v_ref[0]  # (Lk, D)

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BLOCK_Q, Lk)

    rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + qb * BLOCK_Q
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    causal = cols * lq >= (rows + 1) * lk
    pad_pair = (qpad_ref[0, :, 0] > 0)[:, None] & (kpad_ref[0, :, 0] > 0)[None, :]
    # rows beyond the real Lq (block padding) are dont-care
    masked = causal | pad_pair
    logits = jnp.where(masked, NEG_INF, logits)

    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(w, v, preferred_element_type=jnp.float32)


def _rect_attention_fwd_impl(q, k, v, q_pad, k_pad):
    """(BH, Lq, D), (BH, Lk, D), (BH, Lk, D), (BH, Lq), (BH, Lk)."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    blocks = pl.cdiv(lq, BLOCK_Q)
    lq_padded = blocks * BLOCK_Q
    if lq_padded != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_padded - lq), (0, 0)))
        q_pad = jnp.pad(q_pad, ((0, 0), (0, lq_padded - lq)))

    scale = 1.0 / (d**0.5)
    out = pl.pallas_call(
        functools.partial(_kernel, lq=lq, lk=lk, scale=scale),
        grid=(bh, blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, lq_padded, d), jnp.float32),
    )(
        q_pad.astype(jnp.int32)[..., None],
        k_pad.astype(jnp.int32)[..., None],
        q,
        k,
        v,
    )
    return out[:, :lq]


def _bwd_kernel(
    qpad_ref, kpad_ref, q_ref, k_ref, v_ref, g_ref,
    dq_ref, dk_ref, dv_ref, *, lq, lk, scale,
):
    """Blockwise backward: recompute w for this q block, emit dq, and
    accumulate dk/dv across the q-block grid dimension (the same output
    block is revisited for consecutive programs — the documented TPU
    reduction pattern; q-block is the fastest-varying grid dim)."""
    qb = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + qb * BLOCK_Q
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    causal = cols * lq >= (rows + 1) * lk
    pad_pair = (qpad_ref[0, :, 0] > 0)[:, None] & (kpad_ref[0, :, 0] > 0)[None, :]
    logits = jnp.where(causal | pad_pair, NEG_INF, logits)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # (BLOCK_Q, Lk)

    dw = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK_Q, Lk)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))

    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk_part = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (Lk, D)
    dv_part = jax.lax.dot_general(
        w, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Lk, D)

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_part
    dv_ref[0] += dv_part


def _rect_attention_bwd_impl(q, k, v, q_pad, k_pad, g):
    bh, lq, d = q.shape
    lk = k.shape[1]
    blocks = pl.cdiv(lq, BLOCK_Q)
    lq_padded = blocks * BLOCK_Q
    if lq_padded != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_padded - lq), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, lq_padded - lq), (0, 0)))
        # block-padding rows must not contribute to dk/dv: their upstream
        # grad is zero after padding, so ds = w * 0-terms = 0 via dw=0? No:
        # ds depends on dw which is 0 for zero g rows -> ds = 0. Safe.
        q_pad = jnp.pad(q_pad, ((0, 0), (0, lq_padded - lq)))

    scale = 1.0 / (d**0.5)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, lq=lq, lk=lk, scale=scale),
        grid=(bh, blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_padded, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, lk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, lk, d), jnp.float32),
        ),
    )(
        q_pad.astype(jnp.int32)[..., None],
        k_pad.astype(jnp.int32)[..., None],
        q,
        k,
        v,
        g,
    )
    return dq[:, :lq], dk, dv


def _xla_reference(q, k, v, q_pad, k_pad):
    """Same math with plain XLA ops (used for the backward pass)."""
    lq, lk = q.shape[1], k.shape[1]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum(
        "bld,bsd->bls", q, k, preferred_element_type=jnp.float32
    ) * scale
    i = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    causal = j * lq >= (i + 1) * lk
    masked = causal[None] | (q_pad[:, :, None] & k_pad[:, None, :])
    logits = jnp.where(masked, NEG_INF, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bls,bsd->bld", w, v, preferred_element_type=jnp.float32)


@jax.custom_vjp
def rect_attention(q, k, v, q_pad, k_pad):
    """Rectangular-causal attention, Pallas fwd / XLA-recompute bwd.

    q: (BH, Lq, D)   k, v: (BH, Lk, D)   pads: bool (BH, Lq)/(BH, Lk)
    Lengths must be rate-aligned like ops/masks.rectangular_causal_mask.
    """
    return _rect_attention_fwd_impl(q, k, v, q_pad, k_pad)


def _fwd(q, k, v, q_pad, k_pad):
    return _rect_attention_fwd_impl(q, k, v, q_pad, k_pad), (
        q, k, v, q_pad, k_pad,
    )


def _bwd(res, g):
    q, k, v, q_pad, k_pad = res
    dq, dk, dv = _rect_attention_bwd_impl(q, k, v, q_pad, k_pad, g)
    return dq, dk, dv, None, None


rect_attention.defvjp(_fwd, _bwd)


def rect_attention_mha(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,
    q_pad: Optional[jnp.ndarray] = None,  # (B, Lq) bool
    k_pad: Optional[jnp.ndarray] = None,  # (B, Lk) bool
) -> jnp.ndarray:
    """Head-batched wrapper matching scaled_dot_attention's layout."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if q_pad is None:
        q_pad = jnp.zeros((b, lq), bool)
    if k_pad is None:
        k_pad = jnp.zeros((b, lk), bool)
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    qp = jnp.repeat(q_pad, h, axis=0)
    kp = jnp.repeat(k_pad, h, axis=0)
    out = rect_attention(qf, kf, vf, qp, kp)
    return out.reshape(b, h, lq, d)
