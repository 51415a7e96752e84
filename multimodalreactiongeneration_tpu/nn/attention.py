"""Multi-head attention with torch-parity semantics (kdim/vdim, bool masks).

Replaces torch.nn.MultiheadAttention as used by the reference in
MultiModalAttentionBlockSequential (multi_modal_att.py:12-19) and
MHAforSequentail (for_sequential.py:27-37). Differences by design:

  * masks arrive as bool (True = masked) at rank 2/3/4 and are broadcast
    per head inside the kernel instead of being materialized (B*H, L, S)
    as the reference does (multi_modal_metaformer.py:64-65,74).
  * fully-masked rows produce a uniform average instead of torch's NaN —
    the reference only ever hits such rows on padding positions whose
    outputs are discarded by the loss mask, so behavior is equivalent
    where it matters, and finite values keep XLA fusions NaN-free.
  * projections are stored in torch layout (out_features, in_features)
    under torch-compatible names so a torch state_dict imports without
    reshaping (checkpoint importer, train/checkpoint.py).
  * project_kv / attend are exposed separately so decode caches can hold
    POST-projection K/V: per step only the new chunk is projected instead
    of the whole ring buffer (the decode hot-path optimization).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


def _xavier_uniform_torch(key, shape, dtype=jnp.float32):
    # torch nn.MultiheadAttention uses xavier_uniform_ on projection weights
    fan_out, fan_in = shape[0], shape[1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _broadcast_mask(
    attn_mask: Optional[jnp.ndarray],
    batch: int,
    heads: int,
    q_len: int,
    k_len: int,
) -> Optional[jnp.ndarray]:
    """Accept (L,S), (B,L,S), (B*H,L,S) or (B,H,L,S) -> (B,H,L,S) or None."""
    if attn_mask is None:
        return None
    if attn_mask.ndim == 2:
        return attn_mask[None, None]
    if attn_mask.ndim == 3:
        if attn_mask.shape[0] == batch * heads:
            return attn_mask.reshape(batch, heads, q_len, k_len)
        return attn_mask[:, None]
    return attn_mask


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B,H,L,Dh) x (B,H,S,Dh) x (B,H,S,Dh) -> (B,H,L,Dh).

    bool mask True = masked. Softmax is computed in f32 with a finite
    -1e30 bias: masked logits underflow to exactly 0 probability unless the
    entire row is masked (then the row degrades to a uniform average).
    """
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    if k.dtype == jnp.bfloat16 and q.dtype == jnp.float32:
        # same dtype-matching rule as attend_raw: don't let an f32
        # query drag a bf16 K (decode ring buffers) onto the f32 MXU
        # path; accumulation stays f32 via preferred_element_type
        q = q.astype(jnp.bfloat16)
    logits = jnp.einsum(
        "bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, jnp.asarray(NEG_INF, logits.dtype), logits)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhls,bhsd->bhld", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )


def _rect_attn_enabled() -> bool:
    """MRGEN_FUSED_ATTN: '0' off, 'force' always (interpret tests),
    default auto = on when the backend is TPU."""
    import os

    v = os.environ.get("MRGEN_FUSED_ATTN", "auto")
    if v == "0":
        return False
    if v == "force":
        return True
    return jax.default_backend() == "tpu"


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention(batch_first=True) equivalent.

    rect_pad_masks=True declares that any rank-3 attn_mask passed to
    plain (uncached) attention is a rect-causal | pad-pair mask built by
    ops/masks.merged_attention_mask — enabling the fused Pallas
    attention path, which reconstructs the pad vectors from the mask
    (exact for such masks) and never materializes (B, H, Lq, Lk)
    scores in HBM (ops/pallas_rect_attention.py)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    use_bias: bool = True
    rect_pad_masks: bool = False

    def setup(self):
        e = self.embed_dim
        kdim = self.kdim if self.kdim is not None else e
        vdim = self.vdim if self.vdim is not None else e
        self.w_q = self.param("q_proj_weight", _xavier_uniform_torch, (e, e))
        self.w_k = self.param("k_proj_weight", _xavier_uniform_torch, (e, kdim))
        self.w_v = self.param("v_proj_weight", _xavier_uniform_torch, (e, vdim))
        # torch's _reset_parameters xavier-inits only the IN projections;
        # out_proj keeps nn.Linear's kaiming-uniform default, i.e.
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — match it so from-scratch
        # runs are distribution-matched to the reference
        self.out_w = self.param(
            "out_proj_weight",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype,
                -1.0 / jnp.sqrt(shape[1]), 1.0 / jnp.sqrt(shape[1])
            ),
            (e, e),
        )
        if self.use_bias:
            self.b_q = self.param("q_proj_bias", nn.initializers.zeros, (e,))
            self.b_k = self.param("k_proj_bias", nn.initializers.zeros, (e,))
            self.b_v = self.param("v_proj_bias", nn.initializers.zeros, (e,))
            self.out_b = self.param(
                "out_proj_bias", nn.initializers.zeros, (e,)
            )
        else:
            self.b_q = self.b_k = self.b_v = self.out_b = 0.0

    def project_kv(
        self, key: jnp.ndarray, value: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B,S,kdim/vdim) -> projected (B,S,E) pair (cacheable)."""
        k = jnp.einsum("bsk,ek->bse", key, self.w_k) + self.b_k
        v = jnp.einsum("bsk,ek->bse", value, self.w_v) + self.b_v
        return k, v

    def attend(
        self,
        query: jnp.ndarray,
        k_proj: jnp.ndarray,
        v_proj: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        rect_pad_hint: bool = False,
    ) -> jnp.ndarray:
        """Attention over ALREADY-projected K/V (both (B,S,E)).

        rect_pad_hint (set by __call__ on rect_pad_masks modules, never
        by the decode cache paths whose masks have other shapes) routes
        rate-aligned rank-3 masks to the fused rect-attention kernel."""
        e, h = self.embed_dim, self.num_heads
        dh = e // h
        batch, q_len = query.shape[0], query.shape[1]
        k_len = k_proj.shape[1]

        q_flat = jnp.einsum("blk,ek->ble", query, self.w_q) + self.b_q

        if (
            rect_pad_hint
            and attn_mask is not None
            and attn_mask.ndim == 3
            and attn_mask.shape[0] == batch
            and (q_len % k_len == 0 or k_len % q_len == 0)
            and _rect_attn_enabled()
        ):
            from multimodalreactiongeneration_tpu.ops.masks import (
                rectangular_causal_mask,
            )
            from multimodalreactiongeneration_tpu.ops.pallas_rect_attention import (
                rect_attention,
            )

            # pad vectors back out of the merged mask — exact for
            # masks built by ops/masks.merged_attention_mask (the pad
            # part is an outer product of the indicators). The kernel
            # folds heads internally and consumes/produces the
            # projection layout (B, L, E) directly — no head
            # transposes materialize on this path.
            pp = attn_mask & ~rectangular_causal_mask(q_len, k_len)[None]
            ctx_flat = rect_attention(
                h, q_flat, k_proj, v_proj, pp.any(axis=2), pp.any(axis=1)
            )
            if self.dropout > 0 and not deterministic:
                ctx_flat = nn.Dropout(self.dropout)(
                    ctx_flat, deterministic=False
                )
            return (
                jnp.einsum("ble,oe->blo", ctx_flat, self.out_w)
                + self.out_b
            )

        q = q_flat.reshape(batch, q_len, h, dh).transpose(0, 2, 1, 3)
        k = k_proj.reshape(batch, k_len, h, dh).transpose(0, 2, 1, 3)
        v = v_proj.reshape(batch, k_len, h, dh).transpose(0, 2, 1, 3)
        mask = _broadcast_mask(attn_mask, batch, h, q_len, k_len)
        ctx = scaled_dot_attention(q, k, v, mask)
        if self.dropout > 0 and not deterministic:
            # torch drops attention *weights*; dropping the context rows is
            # a close, fusion-friendly approximation used only in training.
            ctx = nn.Dropout(self.dropout)(ctx, deterministic=False)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(batch, q_len, e)
        return jnp.einsum("ble,oe->blo", ctx, self.out_w) + self.out_b

    def attend_raw(
        self,
        query: jnp.ndarray,
        raw: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Attention over RAW (pre-projection) key=value tokens, with the
        K/V projections folded out of the S-length stream.

        Exact algebraic restructuring of ``__call__(q, raw, raw, mask)``
        when key is value (the integrator/decode case):

          * logits: Q_h K_h^T = (qW_q^T + b_q)_h (raw W_k^T + b_k)_h^T.
            The b_k term adds (qW_q^T + b_q)_h · b_k_h — the SAME scalar
            to every key position of a given query row, and softmax is
            shift-invariant per row, so b_k drops out EXACTLY. The rest
            regroups as q̃_h raw^T with q̃_h = (qW_q^T + b_q)_h W_k_h.
          * context: Σ_s w_s (raw_s W_v^T + b_v)_h = (w·raw) W_v_h^T
            + b_v_h, because attention weights sum to 1 per row (also on
            fully-masked rows, which degrade to a uniform average).

        Why: during AR decode every metaformer block attends the SAME
        other-modality encodings; caching the single raw stream instead
        of per-(block, inner-layer) projected K/V pairs shrinks the
        carried state 2 x num_block x and keeps it VMEM-resident
        (measured: the 10 ring-buffer attentions of the production
        decode step drop 57.3 -> ~25 ms per 250-step generation on v5e).
        The extra fold work touches only (E x kdim) weight panels and the
        (B, L, ·) query — tiny next to streaming S-length K/V copies.

        Numerics: same ops reassociated; f32 logits/softmax as in
        ``attend``. Matches __call__ to float-reassociation tolerance
        (tests/test_attention.py).
        """
        e, h = self.embed_dim, self.num_heads
        dh = e // h
        kdim = raw.shape[-1]
        if (self.vdim or e) != (self.kdim or e):
            # key IS value here, so both projections read the same
            # raw dim; kdim != vdim modules must use project_kv/attend
            raise ValueError(
                "attend_raw requires kdim == vdim (key and value are "
                f"the same raw stream); got kdim={self.kdim} "
                f"vdim={self.vdim}"
            )
        batch, q_len, s_len = query.shape[0], query.shape[1], raw.shape[1]

        q = jnp.einsum("blk,ek->ble", query, self.w_q) + self.b_q
        qh = q.reshape(batch, q_len, h, dh).transpose(0, 2, 1, 3)
        # fold W_k into the query side: q̃_h = q_h @ W_k_h  (per head,
        # W_k rows [h*dh:(h+1)*dh] project raw -> head h's key space)
        wk_h = self.w_k.reshape(h, dh, kdim)
        q_fold = jnp.einsum("bhld,hdk->bhlk", qh, wk_h)

        scale = 1.0 / jnp.sqrt(jnp.float32(dh))
        if raw.dtype == jnp.bfloat16:
            # match operand dtypes: an f32 query against a bf16 cache
            # promotes the WHOLE S-length matmul to the multi-pass f32
            # MXU path (~4x slower). bf16 x bf16 with f32 accumulation
            # is the intended mixed-precision contract of the bf16
            # cache; f32 caches keep the exact f32 matmul (parity
            # tests pin cache_dtype=f32). Measured: the 10 ring-buffer
            # attentions of the decode step drop ~24 -> ~11 ms per
            # 250-step generation on v5e.
            q_fold = q_fold.astype(jnp.bfloat16)
        logits = jnp.einsum(
            "bhlk,bsk->bhls", q_fold, raw,
            preferred_element_type=jnp.float32,
        ) * scale
        mask = _broadcast_mask(attn_mask, batch, h, q_len, s_len)
        if mask is not None:
            logits = jnp.where(mask, jnp.asarray(NEG_INF, logits.dtype), logits)
        weights = jax.nn.softmax(logits, axis=-1)
        ctx_pre = jnp.einsum(
            "bhls,bsk->bhlk", weights.astype(raw.dtype), raw,
            preferred_element_type=jnp.float32,
        )
        # fold W_v back on the output side, restore b_v (weights sum to 1)
        wv_h = self.w_v.reshape(h, dh, kdim)
        ctx = jnp.einsum("bhlk,hdk->bhld", ctx_pre, wv_h)
        if self.use_bias:
            ctx = ctx + self.b_v.reshape(h, 1, dh)[None]
        if self.dropout > 0 and not deterministic:
            ctx = nn.Dropout(self.dropout)(ctx, deterministic=False)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(batch, q_len, e)
        return jnp.einsum("ble,oe->blo", ctx, self.out_w) + self.out_b

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        k, v = self.project_kv(key, value)
        return self.attend(
            query, k, v, attn_mask, deterministic=deterministic,
            rect_pad_hint=self.rect_pad_masks,
        )
