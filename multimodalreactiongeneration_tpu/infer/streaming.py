"""Streaming low-latency reaction generation (BASELINE config #5).

Generates a 12.5 fps head-motion stream from live partner audio/motion
with one jitted step per motion frame. Not present in the reference
(BASELINE.md marks it n/a) — this is the deployment mode its AR models
imply: the same per-step semantics as infer/generate.py, but driven by
an external real-time feed instead of a scan over a stored segment.

Per step the session consumes:
  * 1280 new audio samples (80 ms @ 16 kHz = ``ratio`` fbank hops)
  * one partner head-pose frame (angle+centroid, standardized)
and emits one 18-dim self-motion feature frame (statics + deltas).

Incremental feature extraction keeps exactly the left context the
offline pipeline sees: n_fft-hop window overlap + delta_order extra
frames, so streaming features match offline features bit-for-bit
(tested in tests/test_streaming.py). Latency budget: < 40 ms/frame
(one 80 ms hop produces two 25-fps video frames).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.infer.generate import (
    _init_metaformer_states,
)
from multimodalreactiongeneration_tpu.ops import dsp


def fbank_stream_geometry(cfg: dict):
    """(FbankParams, ratio, hop_samples, context_samples) for streaming.

    One 12.5 fps step consumes ``ratio`` fbank hops of new audio; the
    left context (delta_order extra frames + window-hop overlap, rounded
    UP to a hop multiple so streamed framing lands on the offline frame
    grid) makes each step's features bit-match the offline pipeline.
    """
    fbp = dsp.FbankParams(
        sample_rate=cfg["sampling_rate"],
        n_fft=400,
        hop=cfg["shift"],
        n_mels=cfg["nmels"],
        delta_order=cfg["delta_order"],
    )
    acoustic_fps = cfg["sampling_rate"] / cfg["shift"]
    ratio = int(acoustic_fps / cfg["pred_fps"])
    hop_samples = ratio * fbp.hop  # 1280 @ defaults
    raw_context = fbp.delta_order * fbp.hop + (fbp.n_fft - fbp.hop)
    context_samples = -(-raw_context // fbp.hop) * fbp.hop
    return fbp, ratio, hop_samples, context_samples


class MotionDeltaStream:
    """Incremental delta stacking for a raw 6-dim pose stream.

    Mirrors delta_stack (ops/dsp.py): emits [x, d1, d2] once two prior
    frames exist; caller must feed delta_order warmup frames first.
    """

    def __init__(self, delta_order: int = 2):
        self.delta_order = delta_order
        self._prev: list = []

    def push(self, pose: np.ndarray) -> Optional[np.ndarray]:
        self._prev.append(np.asarray(pose, np.float32))
        if len(self._prev) < self.delta_order + 1:
            return None
        self._prev = self._prev[-(self.delta_order + 1) :]
        x = self._prev
        if self.delta_order == 0:
            return x[-1]
        if self.delta_order == 1:
            return np.concatenate([x[-1], x[-1] - x[-2]])
        d1 = x[-1] - x[-2]
        d1_prev = x[-2] - x[-3]
        return np.concatenate([x[-1], d1, d1 - d1_prev])


class StreamingSession:
    """Stateful 12.5 fps generation session for the Metaformer."""

    def __init__(self, model, params, batch: int = 1,
                 kv_layout: str = None):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.batch = batch
        if kv_layout is None:
            # shared raw-KV layout (infer/generate.py): 10x smaller
            # session state, exact same attention math
            kv_layout = (
                "per_block" if self.cfg["repeat_with_encoder"] else "shared"
            )
        self.kv_layout = kv_layout
        fbp, self.ratio, self.hop_samples, self.context_samples = (
            fbank_stream_geometry(self.cfg)
        )
        self.fb_params = fbp
        self.warmup_frames = self.context_samples // fbp.hop
        self.buf_samples = self.hop_samples + self.context_samples
        self._audio_tail = np.zeros(
            (batch, self.context_samples), np.float32
        )
        self.states = _init_metaformer_states(
            self.cfg, batch, kv_layout=self.kv_layout
        )
        self._prev = jnp.zeros((batch, 1, 18), jnp.float32)

        def step_fn(params, states, prev, audio_buf, mp_frame):
            feat = jax.vmap(
                lambda w: dsp.logmel_with_power(w, fbp)
            )(audio_buf)  # (B, ratio, 81)
            y, new_states = self.model.apply(
                params, feat, mp_frame, prev, states=states, use_masks=False
            )
            return y, new_states

        self._step = jax.jit(step_fn)

    def prime(self, lead_audio: np.ndarray, lead_mp: np.ndarray,
              lead_ms: np.ndarray) -> None:
        """Warm caches/states on a leading segment (feature-space inputs)
        and seed the AR loop with the last lead self-motion frame (same
        rule as generate_metaformer's init prev / ServingEngine.attach —
        a zero seed would snap the first streamed frames to the mean
        pose)."""
        _, self.states = self.model.apply(
            self.params,
            jnp.asarray(lead_audio),
            jnp.asarray(lead_mp),
            jnp.asarray(lead_ms),
            states=self.states,
            use_masks=True,
        )
        self._prev = jnp.asarray(lead_ms)[:, -1:].astype(jnp.float32)

    def step(
        self, audio_samples: np.ndarray, partner_motion: np.ndarray
    ) -> np.ndarray:
        """audio_samples (B, hop_samples) raw f32; partner_motion (B, 1, 18)
        feature frame. Returns the predicted (B, 1, 18) self-motion frame."""
        if audio_samples.shape[-1] != self.hop_samples:
            raise ValueError(
                f"need {self.hop_samples} samples per step, "
                f"got {audio_samples.shape[-1]}"
            )
        buf = np.concatenate([self._audio_tail, audio_samples], axis=-1)
        self._audio_tail = buf[:, -self.context_samples :]
        y, self.states = self._step(
            self.params,
            self.states,
            self._prev,
            jnp.asarray(buf),
            jnp.asarray(partner_motion),
        )
        self._prev = y
        return np.asarray(y)
