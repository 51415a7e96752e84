"""Fused audio feature kernels (framing + mel fbank + log-power + deltas).

TPU-native re-design of the reference's AudioPreprocessor
(/root/reference/mr_gen/utils/preprocess/audio.py:6-67), which chains
torchaudio.transforms.MelSpectrogram(n_fft=400, hop=160, n_mels=26,
center=False) -> log(clamp) -> per-frame log-power computed in a Python
loop (audio.py:41-53) -> delta stacking (audio.py:55-67).

Design notes (why this is not a translation):
  * The DFT is computed as one big framed matmul against precomputed
    cos/sin bases instead of an FFT: frames (T,400) @ basis (400,201).
    At n_fft=400 this maps directly onto the MXU and fuses with the mel
    projection (201,26) matmul; XLA's TPU FFT path would be slower and
    bandwidth-bound at these sizes.
  * Log-power is the same framed energy reduction, fused into the same
    kernel: no Python loop, no extra pass over the signal.
  * Delta stacking is two shifted subtractions on the already-resident
    feature block.

Numeric parity targets (golden-tested in tests/test_dsp.py):
  * hann window: periodic torch.hann_window(n_fft)
  * mel scale: HTK (mel = 2595 log10(1 + f/700)), f_min=0, f_max=sr/2,
    no filterbank norm — torchaudio melscale_fbanks defaults
  * power spectrum (|X|^2), log with clamp at 1e-6 (reference clamps at
    1e-10 then 1e-6; composition == max(x, 1e-6), audio.py:22,31)
  * log-power: un-windowed frame energy, clamp 1e-10 (audio.py:48-51)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LOG_CLAMP_MEL = 1e-6
LOG_CLAMP_POWER = 1e-10


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window(n)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def hz_to_mel(freq):
    """HTK mel scale (torchaudio mel_scale='htk')."""
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank, (n_freqs, n_mels), norm=None.

    Mirrors torchaudio.functional.melscale_fbanks — the filter matrix used
    inside the reference's MelSpectrogram (audio.py:15-21).
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


@dataclass(frozen=True)
class FbankParams:
    """Static DSP configuration (hashable: usable as a jit static arg)."""

    sample_rate: int = 16000
    n_fft: int = 400
    hop: int = 160
    n_mels: int = 26
    delta_order: int = 2

    @property
    def feat_dim(self) -> int:
        return (self.n_mels + 1) * (self.delta_order + 1)

    def num_frames(self, num_samples: int) -> int:
        return (num_samples - self.n_fft) // self.hop + 1

    def num_output_frames(self, num_samples: int) -> int:
        return self.num_frames(num_samples) - self.delta_order


@functools.lru_cache(maxsize=8)
def _bases(params: FbankParams):
    """Precompute (windowed DFT cos/sin, mel fb) as numpy constants.

    Kept as numpy (NOT jnp) so the cache never captures jit tracers; the
    arrays become XLA constants when closed over inside a jitted call.
    """
    n_fft = params.n_fft
    n_freqs = n_fft // 2 + 1
    win = hann_window(n_fft)
    k = np.arange(n_fft)[:, None] * np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * k / n_fft
    cos_b = (np.cos(angle) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(angle) * win[:, None]).astype(np.float32)
    mel_fb = mel_filterbank(n_freqs, params.n_mels, params.sample_rate)
    return cos_b, sin_b, mel_fb


def frame_signal(wave: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(S,) -> (T, n_fft) frame matrix, center=False (no padding)."""
    num_frames = (wave.shape[-1] - n_fft) // hop + 1
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return wave[idx]


def delta_stack(feat: jnp.ndarray, delta_order: int) -> jnp.ndarray:
    """First/second finite-difference stacking (audio.py:55-67 semantics).

    order 0: feat                              (T,   D)
    order 1: [feat[1:], d1]                    (T-1, 2D)
    order 2: [feat[2:], d1[1:], d2]            (T-2, 3D)
    """
    if delta_order == 0:
        return feat
    d1 = feat[1:] - feat[:-1]
    if delta_order == 1:
        return jnp.concatenate([feat[1:], d1], axis=-1)
    if delta_order == 2:
        d2 = d1[1:] - d1[:-1]
        return jnp.concatenate([feat[2:], d1[1:], d2], axis=-1)
    raise ValueError("delta_order must be 0, 1 or 2")


@functools.partial(jax.jit, static_argnums=1)
def logmel_with_power(wave: jnp.ndarray, params: FbankParams) -> jnp.ndarray:
    """Fused fbank pipeline: (S,) float32 -> (T - delta, (n_mels+1)(delta+1)).

    One jitted graph replacing the whole reference AudioPreprocessor call
    chain (audio.py:24-39): framing, windowed DFT power spectrum, mel
    projection, log clamp, un-windowed log-power channel, delta stacking.
    """
    cos_b, sin_b, mel_fb = _bases(params)
    frames = frame_signal(wave, params.n_fft, params.hop)  # (T, n_fft)
    re = jnp.dot(frames, cos_b, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_b, preferred_element_type=jnp.float32)
    power_spec = re * re + im * im  # (T, n_freqs)
    mel = jnp.dot(power_spec, mel_fb, preferred_element_type=jnp.float32)
    log_mel = jnp.log(jnp.maximum(mel, LOG_CLAMP_MEL))
    energy = jnp.sum(frames * frames, axis=-1, keepdims=True)
    log_power = jnp.log(jnp.maximum(energy, LOG_CLAMP_POWER))
    feat = jnp.concatenate([log_mel, log_power], axis=-1)  # (T, n_mels+1)
    return delta_stack(feat, params.delta_order)


@functools.partial(jax.jit, static_argnums=1)
def batched_logmel_with_power(waves: jnp.ndarray, params: FbankParams):
    """(B, S) -> (B, T - delta, D): vmapped fused pipeline for databuild."""
    return jax.vmap(lambda w: logmel_with_power(w, params))(waves)


@functools.partial(jax.jit, static_argnums=(2, 3))
def batched_logmel_masked(
    waves: jnp.ndarray,
    frame_counts: jnp.ndarray,
    params: FbankParams,
    pad_value: float,
):
    """Batched fbank with the pad sentinel applied in-graph.

    (B, S) float32 + (B,) true frame counts -> (B, T - delta, D) where
    rows past each sample's frame count are ``pad_value``. Fusing the
    sentinel fill into the same jitted graph lets the train collate keep
    the feature batch ON DEVICE (data/dataset.py pad_collate_device):
    the previous np.array(...) readback + host fill + re-upload cost a
    full feature-batch round trip over the host link per batch.

    Integer waves are raw PCM16: scaled by 1/2**15 in-graph (exact in
    float32 — wavio.PCM16_SCALE), so the loader can upload int16 at half
    the host-link bytes with bit-identical features.
    """
    if jnp.issubdtype(waves.dtype, jnp.integer):
        waves = waves.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    feats = jax.vmap(lambda w: logmel_with_power(w, params))(waves)
    t = feats.shape[1]
    mask = jnp.arange(t)[None, :] < frame_counts[:, None]
    return jnp.where(mask[:, :, None], feats, jnp.float32(pad_value))


@functools.partial(jax.jit, static_argnums=(1, 2))
def frame_log_power(wave: jnp.ndarray, n_fft: int = 400, hop: int = 160):
    """Framewise log energy for VAD (speech_segmentation.py:30-38).

    NOTE: the reference VAD does *not* clamp — log(0) = -inf is preserved
    because the threshold compare (-4) treats -inf as unvoiced anyway.
    """
    frames = frame_signal(wave, n_fft, hop)
    return jnp.log(jnp.sum(frames * frames, axis=-1))
