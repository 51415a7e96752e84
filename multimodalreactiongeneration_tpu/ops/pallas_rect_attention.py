"""Pallas TPU kernel: fused rectangular cross-rate causal attention.

PROMOTED TO THE MODEL PATH in round 5. The round-3 experiment
(benchmarks/pallas_rect_attention.py) measured this net-neutral on the
train step and demoted it — but that measurement ran the kernel's
matmuls in f32 (multi-pass on the MXU) inside an f32 step. The round-5
train-step profile (bf16, B32 x T240, after the fused-LSTM rounds)
shows cross-attention as the LARGEST remaining block: ~27 ms of the
56.5 ms step, dominated by HBM traffic on the materialized
(B, H, 252, 2016) score/softmax tensors — ~260 MB each, written and
re-read several times across fwd+bwd.

Three design rules, each one measured into this shape on-chip:

  1. Scores never touch HBM: per (batch, q-block) program the logits
     for the whole key range live in VMEM; the rectangular-causal
     predicate ``key j masked for query i <=> j*Lq >= (i+1)*Lk``
     (ops/masks.py equivalence proof) is an in-kernel iota compare,
     merged with the reference's pad-PAIR rule and the block-padding
     column guard.
  2. HEADS FOLD INSIDE the kernel and operands stay in the projection
     layout (B, L, E): the first rank-4 version consumed
     (B, H, L, Dh) transposes, and the boundary copies XLA normally
     fuses into its attention einsums (~33 MB per audio K/V operand)
     measured ~6 ms/step — the entire kernel win. Heads are a static
     python loop over lane slices; the context lands back in (B, L, E)
     and feeds the output projection with no transpose/reshape.
  3. Operand dtype selects MXU matmul precision (bf16 activations =
     full-rate matmuls; the round-3 f32 version ran multi-pass, which
     is why it lost); logits, softmax and accumulation stay f32 like
     nn/attention.scaled_dot_attention. Lk pads only to the sublane
     quantum (8): a 128-quantum pad is a multi-10-MB copy per operand
     (Lk=2016 -> 2048) and measured ~3 ms/step of pure jnp.pad.

The backward is flash-style recompute per q-block: dq written
blockwise; dk/dv accumulated across the q-block grid dim into
revisited output blocks (q-block is the fastest-varying grid dim — the
documented TPU reduction pattern).

Numerics match scaled_dot_attention bit-for-semantics: f32 logits,
finite -1e30 for masked entries (fully-masked rows degrade to a
uniform average, never NaN).

Wiring: nn/attention.TorchMHA(rect_pad_masks=True).attend reconstructs
the pad vectors from the merged mask (exact for masks built by
ops/masks.merged_attention_mask) and dispatches here on TPU;
MRGEN_FUSED_ATTN=0 reverts to the XLA mask path.

Reference semantics: gen_attention_mask + nn.MultiheadAttention
(/root/reference/mr_gen/model/utils/multi_modal_metaformer.py:32-79,
mixer_block.py:560-605).
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

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024
)


def _mask_for(qb, shape, lq, lk, qpad_ref, kpad_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + qb * BLOCK_Q
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    causal = cols * lq >= (rows + 1) * lk
    # reference pad rule: only (pad query, pad key) PAIRS are masked
    # (multi_modal_metaformer.py:70-74); block-padded key columns are
    # masked for everyone
    pad_pair = (
        (qpad_ref[0, :, 0] > 0)[:, None] & (kpad_ref[0, :, 0] > 0)[None, :]
    )
    return causal | pad_pair | (cols >= lk)


def _fwd_kernel(
    qpad_ref, kpad_ref, q_ref, k_ref, v_ref, o_ref,
    *, lq, lk, scale, heads,
):
    qb = pl.program_id(1)
    q = q_ref[0]  # (BLOCK_Q, E)
    k = k_ref[0]  # (Lk_pad, E)
    v = v_ref[0]
    dh = q.shape[-1] // heads

    masked = None
    outs = []
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_Q, Lk_pad) f32
        if masked is None:
            masked = _mask_for(qb, logits.shape, lq, lk, qpad_ref, kpad_ref)
        logits = jnp.where(masked, NEG_INF, logits)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jnp.dot(
            w.astype(v.dtype), v[:, sl],
            preferred_element_type=jnp.float32,
        ))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(
    qpad_ref, kpad_ref, q_ref, k_ref, v_ref, g_ref,
    dq_ref, dk_ref, dv_ref,
    *, lq, lk, scale, heads,
):
    """Blockwise backward: recompute w per (head, q block), emit dq,
    and accumulate dk/dv across the q-block grid dimension."""
    qb = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    mm = q.dtype
    dh = q.shape[-1] // heads

    masked = None
    dqs, dks, dvs = [], [], []
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if masked is None:
            masked = _mask_for(qb, logits.shape, lq, lk, qpad_ref, kpad_ref)
        logits = jnp.where(masked, NEG_INF, logits)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)

        dw = jax.lax.dot_general(
            gh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        ds_mm = ds.astype(mm)

        dqs.append(jax.lax.dot_general(
            ds_mm, kh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
        dks.append(jax.lax.dot_general(
            ds_mm, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)  # (Lk_pad, Dh)
        dvs.append(jax.lax.dot_general(
            w.astype(mm), gh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    dk_part = jnp.concatenate(dks, axis=-1)
    dv_part = jnp.concatenate(dvs, axis=-1)

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_part
    dv_ref[0] += dv_part


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        x = jnp.pad(x, cfg)
    return x


def _operand_dtype(dtype):
    """Matmul-operand dtype matching the XLA path's EFFECTIVE precision.

    The XLA attention this kernel replaces runs f32 einsums at XLA's
    default TPU matmul precision — single-pass bf16 operand truncation.
    An f32 Mosaic dot is the 6x multi-pass decomposition, so keeping
    f32 operands here would make the f32-config train step SLOWER than
    the path it replaces while claiming extra precision the XLA side
    never had. bf16 inputs stay bf16; f32 inputs are truncated to bf16
    UNLESS the user asked for real f32 matmuls via
    jax.default_matmul_precision("highest"/"float32") — the escape
    hatch the parity drive uses.
    """
    if dtype == jnp.bfloat16:
        return jnp.bfloat16
    if jax.default_backend() != "tpu":
        # CPU/GPU f32 einsums are true f32 — match them (also keeps
        # the interpret-mode parity tests exact)
        return dtype
    prec = jax.config.jax_default_matmul_precision
    if prec in ("highest", "float32"):
        return jnp.float32
    return jnp.bfloat16


def _prep(q, k, v, q_pad, k_pad, g=None):
    """Pad Lq to BLOCK_Q and Lk to the sublane quantum (8); cast
    matmul operands per _operand_dtype; pads become rank-3 int32
    (B, L, 1)."""
    mm = _operand_dtype(q.dtype)
    q = _pad_to(q.astype(mm), 1, BLOCK_Q)
    q_pad = _pad_to(q_pad.astype(jnp.int32)[..., None], 1, BLOCK_Q)
    k = _pad_to(k.astype(mm), 1, 8)
    v = _pad_to(v.astype(mm), 1, 8)
    k_pad = _pad_to(k_pad.astype(jnp.int32)[..., None], 1, 8)
    if g is not None:
        g = _pad_to(g.astype(mm), 1, BLOCK_Q)
    return q, k, v, q_pad, k_pad, g


def _rect_attention_fwd_impl(heads, q, k, v, q_pad, k_pad):
    """(B, Lq, E) x (B, Lk, E)^2, bool pads (B, Lq)/(B, Lk)."""
    b, lq, e = q.shape
    lk = k.shape[1]
    qp, kp, vp, q_pad_p, k_pad_p, _ = _prep(q, k, v, q_pad, k_pad)
    blocks = qp.shape[1] // BLOCK_Q
    lk_pad = kp.shape[1]
    scale = 1.0 / ((e // heads) ** 0.5)
    qspec = pl.BlockSpec((1, BLOCK_Q, e), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, lk_pad, e), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, lq=lq, lk=lk, scale=scale, heads=heads
        ),
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, 1), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec, kspec, kspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(
            (b, blocks * BLOCK_Q, e), jnp.float32
        ),
        compiler_params=_COMPILER_PARAMS,
    )(q_pad_p, k_pad_p, qp, kp, vp)
    return out[:, :lq]


def _rect_attention_bwd_impl(heads, q, k, v, q_pad, k_pad, g):
    b, lq, e = q.shape
    lk = k.shape[1]
    qp, kp, vp, q_pad_p, k_pad_p, gp = _prep(q, k, v, q_pad, k_pad, g)
    blocks = qp.shape[1] // BLOCK_Q
    lk_pad = kp.shape[1]
    scale = 1.0 / ((e // heads) ** 0.5)
    qspec = pl.BlockSpec((1, BLOCK_Q, e), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, lk_pad, e), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, lq=lq, lk=lk, scale=scale, heads=heads
        ),
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, 1), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec, kspec, kspec, qspec,
        ],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, blocks * BLOCK_Q, e), jnp.float32),
            jax.ShapeDtypeStruct((b, lk_pad, e), jnp.float32),
            jax.ShapeDtypeStruct((b, lk_pad, e), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
    )(q_pad_p, k_pad_p, qp, kp, vp, gp)
    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def rect_attention(heads, q, k, v, q_pad, k_pad):
    """Rectangular-causal multi-head attention in projection layout.

    heads:  static head count (E % heads == 0)
    q:      (B, Lq, E)   k, v: (B, Lk, E) — the raw projection outputs
    pads:   bool (B, Lq)/(B, Lk), True = padding frame
    Returns the f32 context (B, Lq, E), ready for the output
    projection. Lengths must be rate-aligned like
    ops/masks.rectangular_causal_mask. Operand dtype selects MXU matmul
    precision (pass bf16 activations for full-rate matmuls).
    """
    return _rect_attention_fwd_impl(heads, q, k, v, q_pad, k_pad)


def _fwd(heads, q, k, v, q_pad, k_pad):
    return _rect_attention_fwd_impl(heads, q, k, v, q_pad, k_pad), (
        q, k, v, q_pad, k_pad,
    )


def _bwd(heads, res, g):
    q, k, v, q_pad, k_pad = res
    dq, dk, dv = _rect_attention_bwd_impl(
        heads, q, k, v, q_pad, k_pad, g
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), \
        None, None


rect_attention.defvjp(_fwd, _bwd)


def rect_attention_mha(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,
    q_pad: Optional[jnp.ndarray] = None,  # (B, Lq) bool
    k_pad: Optional[jnp.ndarray] = None,  # (B, Lk) bool
) -> jnp.ndarray:
    """scaled_dot_attention-layout adapter (tests / generic callers).

    Production code should call ``rect_attention`` directly with
    projection-layout operands — this adapter pays the head transposes
    the kernel exists to avoid.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if q_pad is None:
        q_pad = jnp.zeros((b, lq), bool)
    if k_pad is None:
        k_pad = jnp.zeros((b, lk), bool)
    qf = q.transpose(0, 2, 1, 3).reshape(b, lq, h * d)
    kf = k.transpose(0, 2, 1, 3).reshape(b, lk, h * d)
    vf = v.transpose(0, 2, 1, 3).reshape(b, lk, h * d)
    out = rect_attention(h, qf, kf, vf, q_pad, k_pad)
    return out.reshape(b, lq, h, d).transpose(0, 2, 1, 3)
