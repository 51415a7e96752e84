"""SimpleLSTM: windowed one-step head-motion predictor.

Behavior-matched to /root/reference/mr_gen/model/simple_lstm/simple_lstm.py:
  * AcousticEncoder (:48-71): Linear(81 -> affine) + LSTMLayerd
  * MotionEncoder  (:74-97):  Linear(18 -> affine) + LSTMLayerd
  * MultimodalAttention (:155-163 / multi_modal_att.py:6-91): N layers of
    cross-modal MHA (Q=motion, K/V=audio, kdim/vdim) + projection, each
    residual+LN wrapped
  * MotionDecoder (:100-143): LSTMLayerd -> last timestep -> 2-layer map
  * loss (:239-255): MSE with sqrt(delta_loss_scale) scaling on delta
    channels; optional all_static delta recomputation (:223-237)

The whole train step (forward + loss + grads) jits into one XLA program;
see train/harness.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalreactiongeneration_tpu.nn.attention import TorchMHA
from multimodalreactiongeneration_tpu.nn.basic import LN_EPS
from multimodalreactiongeneration_tpu.nn.lstm_block import LSTMLayerd


class MultimodalAttention(nn.Module):
    """Cross-modal attention stack (reference multi_modal_att.py:62-91)."""

    modal1_feat_size: int
    modal2_feat_size: int
    num_head: int = 1
    num_layers: int = 1
    dropout: float = 0.0
    use_residual: bool = True
    use_layer_norm: bool = True

    @nn.compact
    def __call__(self, modal1, modal2, *, deterministic: bool = True):
        for i in range(self.num_layers):
            y = TorchMHA(
                embed_dim=self.modal1_feat_size,
                num_heads=self.num_head,
                dropout=self.dropout,
                kdim=self.modal2_feat_size,
                vdim=self.modal2_feat_size,
                name=f"att_{i}",
            )(modal1, modal2, modal2, deterministic=deterministic)
            y = nn.Dense(self.modal1_feat_size, name=f"projection_{i}")(y)
            if self.use_residual:
                y = y + modal1
                if self.use_layer_norm:
                    y = nn.LayerNorm(epsilon=LN_EPS, name=f"norm_{i}")(y)
            modal1 = y
        return modal1


class SimpleLSTM(nn.Module):
    """cfg is the reference's model config group (simple_lstm/config.yaml)."""

    cfg: dict

    @nn.compact
    def __call__(
        self,
        acoustic_feature: jnp.ndarray,  # (B, Ta, 81)
        motion_feature: jnp.ndarray,  # (B, Tm, 18)
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg

        # acoustic encoder
        a = nn.Dense(cfg["acostic_affine_size"], name="acoustic_embed")(
            acoustic_feature
        )
        a, _ = LSTMLayerd(
            input_size=cfg["acostic_affine_size"],
            lstm_hidden_size=cfg["acostic_lstm_size"],
            affine_hidden_size=cfg["acostic_affine_size"],
            num_layers=cfg["acostic_num_layers"],
            num_layers_per_block=cfg["acostic_num_lstm"],
            output_size=cfg["acostic_output_size"],
            dropout=cfg["dropout_rate"],
            bidirectional=cfg["bidirectional"],
            use_layer_norm=cfg["use_layer_norm"],
            use_relu=cfg["use_relu"],
            use_mixing=cfg["use_mixing"],
            use_residual=cfg["use_residual"],
            name="acoustic_lstm",
        )(a, deterministic=deterministic)

        # motion encoder
        m = nn.Dense(cfg["motion_affine_size"], name="motion_embed")(
            motion_feature
        )
        m, _ = LSTMLayerd(
            input_size=cfg["motion_affine_size"],
            lstm_hidden_size=cfg["motion_lstm_size"],
            affine_hidden_size=cfg["motion_affine_size"],
            num_layers=cfg["motion_num_layers"],
            num_layers_per_block=cfg["motion_num_lstm"],
            output_size=cfg["motion_output_size"],
            dropout=cfg["dropout_rate"],
            bidirectional=cfg["bidirectional"],
            use_layer_norm=cfg["use_layer_norm"],
            use_relu=cfg["use_relu"],
            use_mixing=cfg["use_mixing"],
            use_residual=cfg["use_residual"],
            name="motion_lstm",
        )(m, deterministic=deterministic)

        # cross-modal attention: Q = motion, K/V = audio (reference :186)
        att = MultimodalAttention(
            modal1_feat_size=cfg["motion_output_size"],
            modal2_feat_size=cfg["acostic_output_size"],
            num_head=cfg["att_heads"],
            num_layers=cfg["att_num_layers"],
            dropout=cfg["dropout_rate"],
            use_residual=cfg["att_use_residual"],
            use_layer_norm=cfg["att_use_layer_norm"],
            name="multimodal_att",
        )(m, a, deterministic=deterministic)

        # decoder
        d, _ = LSTMLayerd(
            input_size=cfg["motion_output_size"],
            lstm_hidden_size=cfg["decoder_lstm_size"],
            affine_hidden_size=cfg["decoder_affine_size"],
            bottleneck_size=cfg["decoder_bottleneck_size"],
            num_layers=cfg["decoder_num_layers"],
            num_layers_per_block=cfg["decoder_num_lstm"],
            output_size=cfg["decoder_output_size"],
            dropout=cfg["dropout_rate"],
            bidirectional=cfg["decoder_bidirectional"],
            use_layer_norm=cfg["decoder_use_layer_norm"],
            use_relu=cfg["decoder_use_relu"],
            use_mixing=cfg["decoder_use_mixing"],
            use_residual=cfg["decoder_use_residual"],
            name="decoder_lstm",
        )(att, deterministic=deterministic)

        # take last timestep (reference seq_reshape :127-138), then map
        d = d[:, -1:, :]
        d = nn.Dense(cfg["decoder_mapping_size"], name="mapping_input")(d)
        if cfg["decoder_use_relu"]:
            d = nn.relu(d)
        d = nn.Dense(cfg["output_size"], name="mapping_output")(d)
        return d


def split_and_form(
    x: jnp.ndarray, y: jnp.ndarray, delta_order: int, base_size: int
) -> jnp.ndarray:
    """Recompute deltas from the static prediction (reference :223-237).

    x: (B, T, D) motion context, y: (B, 1, D) prediction. When all_static,
    only y's first ``base_size`` channels are trusted; delta1/2 are rebuilt
    against the last context frame.
    """
    if delta_order == 0:
        return y
    y_s = y[..., :base_size]
    x_last = x[:, -1:, :]
    v = y_s - x_last[..., :base_size]
    if delta_order == 1:
        return jnp.concatenate([y_s, v], axis=-1)
    vx = x_last[..., base_size : 2 * base_size]
    a = v - vx
    return jnp.concatenate([y_s, v, a], axis=-1)


def delta_loss_scaler(
    feat_dim: int, delta_order: int, delta_loss_scale: float
) -> jnp.ndarray:
    """sqrt(scale) on delta channels (reference :246-250)."""
    delta_start = feat_dim // (delta_order + 1)
    scaler = jnp.ones((feat_dim,), jnp.float32)
    return scaler.at[delta_start:].set(jnp.sqrt(delta_loss_scale))


def mse_loss(y: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(y - target))


def simple_lstm_loss(
    y: jnp.ndarray,
    target: jnp.ndarray,
    motion_feature: jnp.ndarray,
    model_cfg: dict,
    metrics_cfg: dict,
    row_mask: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """training_step loss (reference :239-255). Returns (loss, masked
    scaled y). ``row_mask`` (broadcastable, 1 = real row) zeroes rows the
    device batcher appended as -100 filler — applied AFTER split_and_form
    so the all_static delta recompute cannot leak filler into the loss."""
    delta_order = metrics_cfg["delta_order"]
    if model_cfg.get("all_static", False):
        base = (
            int(metrics_cfg["use_centroid"]) + int(metrics_cfg["use_angle"])
        ) * 3
        y = split_and_form(motion_feature, y, delta_order, base)
    if row_mask is not None:
        m = row_mask.astype(y.dtype)
        y = y * m
        target = target * m
    scaler = delta_loss_scaler(
        y.shape[-1], delta_order, model_cfg.get("delta_loss_scale", 1.0)
    )
    return mse_loss(y * scaler, target * scaler), y
