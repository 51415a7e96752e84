"""Multimodal metaformer (reference multi_modal_metaformer.py:82-509).

Architecture, behavior-matched to the reference:
  * per-modal feature Linear into hidden_dim (:433-435)
  * block = per-modal embedding mixers -> cross-attention of the main
    modal into each other modal -> concat -> Linear -> FFN (:220-338)
  * first block encodes other modals; later blocks re-encode them only
    when repeat_with_encoder, otherwise the first block's encodings are
    reused by every integrator (:449-461)
  * output FeedForward maps hidden_dim -> motion feature dim (:473-474)

State handling is re-designed (see nn/mixers.py docstring): ``states`` is
a list of per-block dicts {"emb": [...], "crm": [...]} threaded
functionally; recurrent embedding mixers carry (h, c), attention paths
carry fixed-shape KV ring buffers during decode.

Shared-KV decode layout (states = {"shared": [...], "blocks": [...]}):
when ``repeat_with_encoder`` is off, every block's integrators attend
the SAME block-0 other-modality encodings — so instead of one projected
K/V ring buffer per (block, integrator, layer), ONE raw ring buffer per
other modality (infer/cache.py raw_cache_*) holds the pre-projection
encodings and each integrator folds its own projections via
TorchMHA.attend_raw. Exact same attention math; the carried decode
state shrinks 2 x num_block x (92 MB -> 9.2 MB bf16 at the production
size), keeping it VMEM-resident. In this mode a block RETURNS the
(x_full, mask) pairs in the ``other_modals`` slot — that is the
downstream-reusable form of the encodings, consumed by later blocks as
``shared_kv``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalreactiongeneration_tpu.infer.cache import raw_cache_extend
from multimodalreactiongeneration_tpu.nn.basic import LN_EPS, FeedForward
from multimodalreactiongeneration_tpu.nn.mixers import (
    MHAMixerLayerd,
    build_mixer_layerd,
)

BlockState = Dict[str, List[Any]]


class MultiModalMetaformerBlock(nn.Module):
    """embed -> integrate -> feedforward (reference :220-338)."""

    num_modal: int
    main_mixer: Tuple[str, Dict[str, Any]]
    other_mixers: Sequence[Tuple[str, Dict[str, Any]]]  # empty if no encoders
    integrate_configs: Sequence[Dict[str, Any]]
    feedforward_config: Dict[str, Any]
    encode_other_modal: bool = False

    @nn.compact
    def __call__(
        self,
        main_modal: jnp.ndarray,
        other_modals: List[jnp.ndarray],
        state: Optional[BlockState] = None,
        self_masks: Optional[List[Optional[jnp.ndarray]]] = None,
        cross_masks: Optional[List[Optional[jnp.ndarray]]] = None,
        shared_state: Optional[List[Any]] = None,
        shared_kv: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
        encode_only: bool = False,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], BlockState]:
        n_others = self.num_modal - 1
        self_masks = self_masks or [None] * self.num_modal
        cross_masks = cross_masks or [None] * n_others
        emb_state = state["emb"] if state else [None] * self.num_modal
        crm_state = state["crm"] if state else [None] * n_others

        if encode_only:
            # other-modality encoder pass ONLY (the AR-decode encoder
            # hoist, infer/generate.py): run emb_1..emb_n full-sequence
            # from fresh states and return the encodings. The main path
            # and integrators are not touched — their params are simply
            # unvisited in this apply. Param paths are identical to the
            # normal pass (same emb_i names), so the hoisted encodings
            # are computed by the very same weights.
            assert self.encode_other_modal, "encode_only needs the encoder block"
            encoded = []
            for i, (mixer_type, cfg) in enumerate(self.other_mixers, start=1):
                layerd = build_mixer_layerd(mixer_type, cfg, name=f"emb_{i}")
                x = other_modals[i - 1]
                if mixer_type == "mha":
                    y, _ = layerd(
                        x, attn_mask=self_masks[i], deterministic=deterministic
                    )
                else:
                    y, _ = layerd(x, None, deterministic=deterministic)
                encoded.append(y)
            return encoded

        new_state: BlockState = {"emb": [], "crm": []}

        # --- embedding -----------------------------------------------------
        embed_inputs = [main_modal] + (
            list(other_modals) if self.encode_other_modal else []
        )
        mixers = [self.main_mixer] + (
            list(self.other_mixers) if self.encode_other_modal else []
        )
        embedded = []
        for i, ((mixer_type, cfg), x) in enumerate(zip(mixers, embed_inputs)):
            layerd = build_mixer_layerd(mixer_type, cfg, name=f"emb_{i}")
            if mixer_type == "mha":
                y, st = layerd(
                    x,
                    attn_mask=self_masks[i],
                    caches=emb_state[i],
                    deterministic=deterministic,
                )
            else:
                y, st = layerd(x, emb_state[i], deterministic=deterministic)
            embedded.append(y)
            new_state["emb"].append(st)
        main_out = embedded[0]
        if self.encode_other_modal:
            other_modals = embedded[1:]

        # --- shared-KV extend: push this step's raw other-modality
        # encodings into the per-modality raw ring buffers ONCE; every
        # integrator below (and in later blocks) attends these via
        # attend_raw with its own folded projections
        if shared_state is not None:
            assert self.encode_other_modal, (
                "shared_state belongs to the encoding block"
            )
            new_state["shared"] = []
            shared_kv = []
            for i in range(n_others):
                c2, x_full, mask = raw_cache_extend(
                    shared_state[i], other_modals[i], chunk_mask=cross_masks[i]
                )
                new_state["shared"].append(c2)
                shared_kv.append((x_full, mask))

        # --- integrate (cross attention into each other modal) -------------
        ys = []
        for i, cfg in enumerate(self.integrate_configs):
            integ = MHAMixerLayerd(
                **{**cfg, "self_attention": False}, name=f"integrate_{i}"
            )
            if shared_kv is not None:
                y, st = integ(
                    main_out,
                    shared_raw=shared_kv[i],
                    deterministic=deterministic,
                )
            else:
                y, st = integ(
                    main_out,
                    key=other_modals[i],
                    value=other_modals[i],
                    attn_mask=cross_masks[i],
                    caches=crm_state[i],
                    deterministic=deterministic,
                )
            ys.append(y)
            new_state["crm"].append(st)
        merged = jnp.concatenate(ys, axis=-1)
        ffn_dim = self.feedforward_config["hidden_size"]
        merged = nn.Dense(ffn_dim, name="cat_linear")(merged)

        # --- feedforward ----------------------------------------------------
        out = FeedForward(**self.feedforward_config, name="feed_forward")(merged)
        if shared_kv is not None:
            # downstream-reusable form of the encodings in shared-KV mode
            return out, shared_kv, new_state
        return out, list(other_modals), new_state


class MultiModalMetaformer(nn.Module):
    """Stack of metaformer blocks + output FFN (reference :341-509)."""

    modal_num: int
    hidden_dim: int
    num_layer: int
    main_modal_feature_dim: int
    other_modal_feature_dim: Sequence[int]
    main_mixer: Tuple[str, Dict[str, Any]]
    other_mixers: Sequence[Tuple[str, Dict[str, Any]]]
    integrate_configs: Sequence[Dict[str, Any]]
    feedforward_config: Dict[str, Any]
    output_feedforward_config: Dict[str, Any]
    repeat_with_encoder: bool = False
    interlayer_residual: bool = False
    interlayer_residual_norm: bool = True

    @nn.compact
    def __call__(
        self,
        main_modal: jnp.ndarray,
        other_modals: List[jnp.ndarray],
        states: Optional[List[BlockState]] = None,
        self_masks: Optional[List[Optional[jnp.ndarray]]] = None,
        cross_masks: Optional[List[Optional[jnp.ndarray]]] = None,
        encode_others_only: bool = False,
        precomputed_others: Optional[List[jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[BlockState]]:
        if encode_others_only:
            # hoisted other-modality encoder pass (AR-decode hoist): run
            # feature_embedding_{i+1} + block_0's emb stacks full-sequence
            # and return the encodings — same param paths, same math as
            # the in-loop chunked pass (recurrences carry state across
            # chunks, so chunking is associativity-exact)
            others = [
                nn.Dense(self.hidden_dim, name=f"feature_embedding_{i + 1}")(om)
                for i, om in enumerate(other_modals)
            ]
            block = MultiModalMetaformerBlock(
                num_modal=self.modal_num,
                main_mixer=self.main_mixer,
                other_mixers=self.other_mixers,
                integrate_configs=self.integrate_configs,
                feedforward_config=self.feedforward_config,
                encode_other_modal=True,
                name="block_0",
            )
            return block(
                None, others, None, self_masks, None,
                encode_only=True, deterministic=deterministic,
            )

        # feature projections (reference :433-435, 486-490); with
        # precomputed (already-encoded) others the raw streams are unused
        main = nn.Dense(self.hidden_dim, name="feature_embedding_0")(main_modal)
        others = (
            []
            if precomputed_others is not None
            else [
                nn.Dense(self.hidden_dim, name=f"feature_embedding_{i + 1}")(om)
                for i, om in enumerate(other_modals)
            ]
        )

        # shared-KV decode layout: {"shared": [raw caches], "blocks": [...]}
        shared_mode = isinstance(states, dict)
        if shared_mode and self.repeat_with_encoder:
            raise ValueError(
                "shared-KV decode requires repeat_with_encoder=False "
                "(blocks must reuse block-0 encodings)"
            )
        block_states = states["blocks"] if shared_mode else states
        shared = states["shared"] if shared_mode else None

        new_states: List[BlockState] = []
        new_shared = None
        shared_kv_pre = None
        if precomputed_others is not None:
            # hoisted decode: block-0's other-modality encodings were
            # computed full-sequence up front (encode_others_only); push
            # this step's chunk into the raw ring buffers HERE, once, and
            # let every block (block 0 included) attend them via
            # attend_raw — no encoder runs inside the AR loop
            if not shared_mode:
                raise ValueError(
                    "precomputed_others requires the shared-KV decode "
                    "layout (states = {'shared': ..., 'blocks': ...})"
                )
            new_shared = []
            shared_kv_pre = []
            n_others = self.modal_num - 1
            cm = cross_masks or [None] * n_others
            for i, enc in enumerate(precomputed_others):
                c2, x_full, mask = raw_cache_extend(
                    shared[i], enc, chunk_mask=cm[i]
                )
                new_shared.append(c2)
                shared_kv_pre.append((x_full, mask))

        for layer in range(self.num_layer):
            encode = (
                layer == 0 and precomputed_others is None
            ) or self.repeat_with_encoder
            block = MultiModalMetaformerBlock(
                num_modal=self.modal_num,
                main_mixer=self.main_mixer,
                other_mixers=self.other_mixers if encode else (),
                integrate_configs=self.integrate_configs,
                feedforward_config=self.feedforward_config,
                encode_other_modal=encode,
                name=f"block_{layer}",
            )
            st = None if block_states is None else block_states[layer]
            if shared_kv_pre is not None:
                kv_arg = shared_kv_pre
            elif shared_mode and layer > 0:
                kv_arg = others
            else:
                kv_arg = None
            y, others, new_st = block(
                main,
                others,
                st,
                self_masks,
                cross_masks,
                shared_state=(
                    shared
                    if shared_mode and layer == 0 and shared_kv_pre is None
                    else None
                ),
                shared_kv=kv_arg,
                deterministic=deterministic,
            )
            if shared_mode and layer == 0 and shared_kv_pre is None:
                new_shared = new_st.pop("shared")
            if self.interlayer_residual:
                y = y + main
                if self.interlayer_residual_norm:
                    y = nn.LayerNorm(epsilon=LN_EPS, name=f"inter_norm_{layer}")(y)
            main = y
            new_states.append(new_st)

        out = FeedForward(**self.output_feedforward_config, name="output_ff")(main)
        if shared_mode:
            return out, others, {"shared": new_shared, "blocks": new_states}
        return out, others, new_states
