"""Attention mask construction for cross-rate multimodal attention.

Re-design of the reference's gen_attention_mask
(/root/reference/mr_gen/model/utils/multi_modal_metaformer.py:32-79), which
builds a rectangular causal mask with a tile/triu/transpose/view dance plus
a padding-outer-product mask, materialized per (batch, head) in O(B*H*L*S).

Here the causal part is a single broadcasted-iota comparison that XLA folds
into the attention fusion (never materialized at B*H), and the padding part
stays a rank-3 broadcast. Convention follows torch: True == masked.

Equivalence of the causal rule (proved in tests/test_masks.py against a
torch re-execution of the reference algorithm):
  key j of length S is masked for query i of length L  <=>  j*L >= (i+1)*S
  * S = r*L (audio keys):  j*L >= (i+1)*r*L  <=>  j//r > i      (ref :48-55)
  * L = r*S (motion keys): j*r >= i+1        <=>  j > i//r      (ref :57-63)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PADDING_VALUE = -100.0  # reference model/utils/values.py:88-89


def rectangular_causal_mask(q_len: int, k_len: int) -> jnp.ndarray:
    """(q_len, k_len) bool mask; True = disallowed (causal, cross-rate).

    Requires one length to divide the other (reference raises otherwise,
    multi_modal_metaformer.py:41-45).
    """
    if q_len % k_len != 0 and k_len % q_len != 0:
        raise ValueError(
            f"lengths must be rate-aligned: q_len={q_len}, k_len={k_len}"
        )
    i = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return j * q_len >= (i + 1) * k_len


def padding_indicator(x: jnp.ndarray, padding_value: float = PADDING_VALUE):
    """(B, T, D) -> (B, T) bool; True where the frame is padding.

    Matches the reference's first-channel sentinel test (x[:,:,0] == -100,
    multi_modal_metaformer.py:68-69).
    """
    return x[:, :, 0] == padding_value


def merged_attention_mask(
    q_modal: jnp.ndarray,
    k_modal: jnp.ndarray,
    padding_value: float = PADDING_VALUE,
) -> jnp.ndarray:
    """(B, Lq, Lk) bool mask: rectangular causal OR pad-pair mask.

    The reference's padding term masks only (pad query, pad key) *pairs*
    (outer product, multi_modal_metaformer.py:70-74) — pad queries may still
    attend real keys; their outputs are discarded by the loss mask. Kept
    bit-equivalent. Head broadcasting is left to the attention op instead of
    repeating the mask B*H times (ref :64-65,74).
    """
    causal = rectangular_causal_mask(q_modal.shape[1], k_modal.shape[1])
    q_pad = padding_indicator(q_modal, padding_value)
    k_pad = padding_indicator(k_modal, padding_value)
    pad_pair = q_pad[:, :, None] & k_pad[:, None, :]
    return causal[None, :, :] | pad_pair


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask (True = masked) -> additive attention bias (0 / -inf-ish)."""
    return jnp.where(mask, jnp.asarray(-1e30, dtype), jnp.asarray(0.0, dtype))
