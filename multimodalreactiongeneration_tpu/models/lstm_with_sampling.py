"""LSTMwithSample: streaming autoregressive head-motion model.

Behavior-matched to /root/reference/mr_gen/model/lstm_with_sampling/
lstm_with_sample.py:59-232:
  * acoustic Linear(81 -> sampler_hidden) (:92-94)
  * LSTMSampler: stateful uni-LSTM + 8x stride subsample 100Hz -> 12.5fps
    (:96-102, lstm_sampler.py:26-34)
  * concat [sampled-audio | motion_partner | motion_self] (:211-220)
  * feature Linear -> unidirectional stateful LSTMLayerd
    (use_feed_forward=False, :106-122) -> bottleneck FFN -> 18 dims (:123-130)
  * forward concatenates leading warmup + main segments per modality
    (:181-196); loss slices the leading frames off (training harness).

State = (sampler_state, [per-block LSTM states]). The reference's layerd
state never actually carries (lstm_block.py:164-169 returns the input);
ours does — see nn/lstm_block.py docstring for the parity note.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalreactiongeneration_tpu.nn.lstm_block import LSTMLayerd, LSTMSampler

ModelState = Tuple[Any, List[Any]]


def derived_sizes(model_cfg: dict) -> dict:
    """Input-size arithmetic (reference :76-90)."""
    pred_fps = model_cfg["pred_fps"]
    acoustic_fps = model_cfg["sampling_rate"] / model_cfg["shift"]
    ratio = int(acoustic_fps / pred_fps)
    motion_base = (
        int(model_cfg["use_centroid"]) + int(model_cfg["use_angle"])
    ) * 3
    motion_input = motion_base * (model_cfg["delta_order"] + 1) * 2  # self+partner
    acoustic_input = (model_cfg["nmels"] + 1) * (model_cfg["delta_order"] + 1)
    return dict(
        ratio=ratio,
        motion_input_size=motion_input,
        acoustic_input_size=acoustic_input,
        prediction_input_size=motion_input + model_cfg["sampler_hidden_size"],
        output_size=motion_input // 2,
    )


class LSTMwithSample(nn.Module):
    cfg: dict  # the reference's model config group

    @nn.compact
    def __call__(
        self,
        acoustic_partner: jnp.ndarray,  # (B, Ta, 81)
        motion_partner: jnp.ndarray,  # (B, Tm, 18)
        motion_self: jnp.ndarray,  # (B, Tm, 18)
        leading_acoustic_partner: Optional[jnp.ndarray] = None,
        leading_motion_partner: Optional[jnp.ndarray] = None,
        leading_motion_self: Optional[jnp.ndarray] = None,
        state: Optional[ModelState] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, ModelState]:
        cfg = self.cfg
        sizes = derived_sizes(cfg)

        def cat_lead(lead, main):
            if lead is None or lead.shape[1] == 0:
                return main
            return jnp.concatenate([lead, main], axis=1)

        acoustic = cat_lead(leading_acoustic_partner, acoustic_partner)
        motion_p = cat_lead(leading_motion_partner, motion_partner)
        motion_s = cat_lead(leading_motion_self, motion_self)

        hx_sampler, hxs = (None, None) if state is None else state

        a = nn.Dense(cfg["sampler_hidden_size"], name="acoustic_projection")(
            acoustic
        )
        a, hx_sampler = LSTMSampler(
            hidden_size=cfg["sampler_hidden_size"],
            num_layers=cfg["sampler_num_layers"],
            dropout=cfg["sampler_dropout_rate"],
            decline_rate=sizes["ratio"],
            name="sampling_lstm",
        )(a, hx_sampler, deterministic=deterministic)

        if a.shape[1] != motion_p.shape[1] or a.shape[1] != motion_s.shape[1]:
            raise ValueError(
                f"rate mismatch: sampled audio {a.shape[1]} vs motion "
                f"{motion_p.shape[1]}/{motion_s.shape[1]} (ratio {sizes['ratio']})"
            )

        feats = jnp.concatenate([a, motion_p, motion_s], axis=-1)
        feats = nn.Dense(cfg["hidden_size"], name="feature_projection")(feats)
        h, hxs = LSTMLayerd(
            input_size=cfg["hidden_size"],
            lstm_hidden_size=cfg["hidden_size"],
            affine_hidden_size=cfg["hidden_size"],
            bottleneck_size=cfg["bottleneck_size"],
            num_layers=cfg["num_layers"],
            num_layers_per_block=cfg["num_lstm"],
            output_size=cfg["hidden_size"],
            dropout=cfg["dropout_rate"],
            bidirectional=False,
            use_layer_norm=cfg["use_layer_norm"],
            use_mixing=cfg["use_mixing"],
            use_residual=cfg["use_residual"],
            use_feed_forward=False,
            name="layerd_lstm",
        )(feats, hxs, deterministic=deterministic)

        y = nn.Dense(cfg["bottleneck_size"], name="ff_input")(h)
        if cfg["use_relu"]:
            y = nn.relu(y)
        y = nn.Dense(sizes["output_size"], name="ff_mapping")(y)
        return y, (hx_sampler, hxs)
