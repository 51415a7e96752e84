"""Metaformer ("lstmformer"): multimodal metaformer head-motion model.

Behavior-matched to /root/reference/mr_gen/model/lstmformer/lstmformer.py:
  * modalities [audio, motion_partner, motion_self], main_modal_idx=2
    (config.yaml:34,83-86)
  * per-modality embedding mixers chosen from YAML (emb_mixers, :125-127)
  * integrators forced to MHA with per-modality context budgets
    max_context_len[s] x rate (:98-110, 171-178)
  * forward concatenates lead+seq, builds the rectangular cross-rate and
    self-attention masks, runs the metaformer (:236-311)

Mask layout mirrors the reference: cross masks [motion->audio,
motion->motion_partner]; self masks [motion_self, audio, motion_partner]
built only for "mha" embedding mixers (:279-290).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalreactiongeneration_tpu.nn.metaformer import MultiModalMetaformer
from multimodalreactiongeneration_tpu.ops.masks import (
    merged_attention_mask,
    rectangular_causal_mask,
)


def derived_sizes(model_cfg: dict) -> dict:
    """Feature-size / rate arithmetic (reference :87-117)."""
    pred_fps = model_cfg["pred_fps"]
    acoustic_fps = model_cfg["sampling_rate"] / model_cfg["shift"]
    ratio = acoustic_fps / pred_fps
    if ratio != int(ratio):
        raise ValueError("pred_fps must divide acoustic_fps")
    motion_base = (
        int(model_cfg["use_centroid"]) + int(model_cfg["use_angle"])
    ) * 3
    return dict(
        ratio=int(ratio),
        acoustic_fps=acoustic_fps,
        acoustic_input_size=(model_cfg["nmels"] + 1)
        * (model_cfg["delta_order"] + 1),
        motion_input_size=motion_base * (model_cfg["delta_order"] + 1),
    )


def context_budgets(model_cfg: dict) -> List[int]:
    """Per-other-modality KV budgets in tokens (reference :98-110)."""
    sizes = derived_sizes(model_cfg)
    budgets = []
    modalities = list(model_cfg["modalities"])
    modalities.pop(model_cfg["main_modal_idx"])
    for modal in modalities:
        if modal == "audio":
            budgets.append(int(model_cfg["max_context_len"] * sizes["acoustic_fps"]))
        elif modal == "motion":
            budgets.append(int(model_cfg["max_context_len"] * model_cfg["pred_fps"]))
        else:
            raise ValueError(f"invalid modality {modal!r}")
    return budgets


def _layerd_config(mixer_type: str, cfg: dict, num_layerd: int) -> dict:
    """Translate the reference's flat mixer kwargs (common_configs,
    lstmformer.py:135-158 + argparser.py dispatch) to our layerd kwargs."""
    common = dict(
        hidden_size=cfg["hidden_size"],
        num_layerd=num_layerd,
        num_internal_layer=cfg["num_internal_layer"],
        nonlinearity=cfg["nonlinearity"],
        residual=cfg["residual"],
        residual_layer_norm=cfg["residual_layer_norm"],
        bottleneck_size=cfg["bottleneck_size"],
        use_bias=cfg["bias"],
    )
    if mixer_type in ("gru", "lstm"):
        common.update(dropout=cfg["dropout"], bidirectional=False)
    elif mixer_type == "mha":
        common.update(
            num_heads=cfg["num_heads"],
            dropout=cfg["dropout"],
            kdim=cfg["hidden_size"],
            vdim=cfg["hidden_size"],
            self_attention=True,
        )
    return common


class Metaformer(nn.Module):
    cfg: dict  # the reference's model config group

    def _build(self) -> MultiModalMetaformer:
        cfg = self.cfg
        sizes = derived_sizes(cfg)
        main_idx = cfg["main_modal_idx"]
        emb_mixers = list(cfg["emb_mixers"])
        main_type = emb_mixers[main_idx]
        other_types = list(emb_mixers)
        other_types.pop(main_idx)

        main_mixer = (main_type, _layerd_config(main_type, cfg, cfg["num_layerd"]))
        other_mixers = tuple(
            (t, _layerd_config(t, cfg, cfg["encoder_num_layer"]))
            for t in other_types
        )
        integ = _layerd_config("mha", cfg, cfg["num_layerd"])
        integ["self_attention"] = False
        # rect_pad_masks: the training cross-masks are always
        # ops/masks.merged_attention_mask products (forward() below), so
        # the integrators' uncached attention may take the fused
        # rect-attention kernel path (nn/attention.py attend)
        integrate_configs = tuple(
            dict(integ, rect_pad_masks=True)
            for _ in range(len(cfg["modalities"]) - 1)
        )
        ff = dict(
            hidden_size=cfg["hidden_size"],
            bottleneck_size=cfg["bottleneck_size"],
            nonlinearity=cfg["ffn_nonlinearity"],
            residual=cfg["residual"],
            residual_layer_norm=cfg["residual_layer_norm"],
            use_bias=cfg["bias"],
        )
        out_ff = dict(
            hidden_size=cfg["hidden_size"],
            bottleneck_size=cfg["bottleneck_size"],
            output_size=sizes["motion_input_size"],
            nonlinearity=cfg["ffn_nonlinearity"],
            residual=False,
            use_bias=cfg["bias"],
        )
        return MultiModalMetaformer(
            modal_num=len(cfg["modalities"]),
            hidden_dim=cfg["hidden_size"],
            num_layer=cfg["num_block"],
            main_modal_feature_dim=sizes["motion_input_size"],
            other_modal_feature_dim=(
                sizes["acoustic_input_size"],
                sizes["motion_input_size"],
            ),
            main_mixer=main_mixer,
            other_mixers=other_mixers,
            integrate_configs=integrate_configs,
            feedforward_config=ff,
            output_feedforward_config=out_ff,
            repeat_with_encoder=cfg["repeat_with_encoder"],
            interlayer_residual=cfg["interlayer_residual"],
            interlayer_residual_norm=cfg["interlayer_residual_norm"],
            name="metaformer",
        )

    @nn.compact
    def __call__(
        self,
        acoustic_partner: jnp.ndarray,
        motion_partner: jnp.ndarray,
        motion_self: jnp.ndarray,
        leading_acoustic_partner: Optional[jnp.ndarray] = None,
        leading_motion_partner: Optional[jnp.ndarray] = None,
        leading_motion_self: Optional[jnp.ndarray] = None,
        states: Optional[List[Any]] = None,
        *,
        use_masks: bool = True,
        deterministic: bool = True,
        encode_others_only: bool = False,
        precomputed_others: Optional[List[jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, List[Any]]:
        cfg = self.cfg

        def cat_lead(lead, main):
            if main is None or lead is None or lead.shape[1] == 0:
                return main
            return jnp.concatenate([lead, main], axis=1)

        acoustic = cat_lead(leading_acoustic_partner, acoustic_partner)
        motion_p = cat_lead(leading_motion_partner, motion_partner)
        motion_s = cat_lead(leading_motion_self, motion_self)

        main_idx = cfg["main_modal_idx"]
        emb_mixers = list(cfg["emb_mixers"])
        other_types = list(emb_mixers)
        main_type = other_types.pop(main_idx)

        if encode_others_only:
            # hoisted other-modality encoder pass for AR decode
            # (infer/generate.py): acoustic_partner / motion_partner are
            # the FULL streams (lead + seq); returns their block-0
            # encodings. mha embeddings are refused: a full-sequence
            # causal mask sees unboundedly far back, while the in-loop
            # ring buffer truncates to the context budget — hoisting them
            # would need a banded mask to match (not implemented).
            if any(t == "mha" for t in other_types):
                raise ValueError(
                    "encode_others_only does not support mha other-"
                    "modality embeddings (ring-buffer visibility differs "
                    "from a full-sequence causal mask); use the in-loop "
                    "decode path"
                )
            return self._build()(
                None,
                [acoustic, motion_p],
                None,
                None,
                None,
                encode_others_only=True,
                deterministic=deterministic,
            )

        self_masks = [None, None, None]
        cross_masks = [None, None]
        if use_masks:
            cross_masks = [
                merged_attention_mask(motion_s, acoustic),
                merged_attention_mask(motion_s, motion_p),
            ]
            if main_type == "mha":
                self_masks[0] = merged_attention_mask(motion_s, motion_s)
            if other_types[0] == "mha":
                self_masks[1] = merged_attention_mask(acoustic, acoustic)
            if other_types[1] == "mha":
                self_masks[2] = merged_attention_mask(motion_p, motion_p)
        elif states is not None:
            # decode steps (use_masks=False): mha self-attention embeddings
            # still need INTRA-CHUNK causality — an audio step carries
            # `ratio` frames and frame i must not see frame j > i within
            # the chunk (cache validity only handles older tokens). The
            # chunk mask is scattered onto the primed slots by
            # cache_extend; single-frame chunks get a trivial mask.
            if main_type == "mha":
                self_masks[0] = rectangular_causal_mask(
                    motion_s.shape[1], motion_s.shape[1]
                )
            if other_types[0] == "mha" and acoustic is not None:
                self_masks[1] = rectangular_causal_mask(
                    acoustic.shape[1], acoustic.shape[1]
                )
            if other_types[1] == "mha" and motion_p is not None:
                self_masks[2] = rectangular_causal_mask(
                    motion_p.shape[1], motion_p.shape[1]
                )

        y, _, new_states = self._build()(
            motion_s,
            [acoustic, motion_p],
            states,
            self_masks,
            cross_masks,
            precomputed_others=precomputed_others,
            deterministic=deterministic,
        )
        return y, new_states
