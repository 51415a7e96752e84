"""Kaldi-style FBANK / MFCC / SPEC extractor, batched and jitted.

Spec source: /root/reference/mr_gen/utils/tools/feature_extractor.py
(the reference's from-scratch NumPy DSP used as the documented formula
set; SURVEY.md §2.2). Frame-at-a-time Python loops become one fused
vectorized graph:

  * dithering: uniform(-d, d) per sample (reference uses unseeded
    np.random.rand, :128-133 — here a jax PRNG key, deterministic)
  * DC cut per frame (:136), log frame power floored at 1e-10 (:139-144)
  * pre-emphasis 0.97 with the first-sample convention window[0] *= 0.03
    (:147-152)
  * Hamming window (:154-156), rFFT at next-pow2 size, power spectrum
  * mel triangles on 1127*ln(1+f/700), low/high cutoffs, floored at 0.1
    (:80-116, 192)
  * MFCC: orthonormal DCT-II, sinusoidal liftering, C0 replaced by the
    log power (:233-269)
  * SPEC: dB re 2e-5 magnitude spectrum (:202-231)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def herz_to_mel(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


@dataclass(frozen=True)
class KaldiParams:
    sample_frequency: float = 16000.0
    frame_length_ms: int = 25
    frame_shift_ms: int = 10
    num_mel_bins: int = 23
    num_ceps: int = 13
    lifter_coef: float = 22.0
    low_frequency: float = 20.0
    high_frequency: float = 8000.0
    dither: float = 1e-6

    @property
    def frame_size(self) -> int:
        return int(self.sample_frequency * self.frame_length_ms * 0.001)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_frequency * self.frame_shift_ms * 0.001)

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.frame_size:
            n *= 2
        return n


@functools.lru_cache(maxsize=4)
def _constants(p: KaldiParams):
    dim_spectrum = p.fft_size // 2 + 1
    mel_points = np.linspace(
        herz_to_mel(p.low_frequency), herz_to_mel(p.high_frequency),
        p.num_mel_bins + 2,
    )
    freqs = np.arange(dim_spectrum) * p.sample_frequency / 2 / dim_spectrum
    mels = herz_to_mel(freqs)
    fb = np.zeros((p.num_mel_bins, dim_spectrum))
    for m in range(p.num_mel_bins):
        left, center, right = mel_points[m : m + 3]
        up = (mels - left) / (center - left)
        down = (right - mels) / (right - center)
        w = np.where(mels <= center, up, down)
        fb[m] = np.where((mels > left) & (mels < right), w, 0.0)

    n = p.num_mel_bins
    dct = np.zeros((p.num_ceps, n))
    dct[0] = 1.0 / np.sqrt(n)
    for k in range(1, p.num_ceps):
        dct[k] = np.sqrt(2.0 / n) * np.cos(
            (2.0 * np.arange(n) + 1) * k * np.pi / (2 * n)
        )

    lifter = 1.0 + 0.5 * p.lifter_coef * np.sin(
        np.pi * np.arange(p.num_ceps) / p.lifter_coef
    )
    hamming = np.hamming(p.frame_size)
    return (
        fb.astype(np.float32),
        dct.astype(np.float32),
        lifter.astype(np.float32),
        hamming.astype(np.float32),
    )


def _windows(wave: jnp.ndarray, p: KaldiParams, key: Optional[jax.Array]):
    """(S,) -> preprocessed frames (T, frame_size) + log power (T,)."""
    num_frames = (wave.shape[-1] - p.frame_size) // p.frame_shift + 1
    idx = (
        jnp.arange(num_frames)[:, None] * p.frame_shift
        + jnp.arange(p.frame_size)[None, :]
    )
    frames = wave[idx]
    if p.dither > 0 and key is not None:
        noise = jax.random.uniform(
            key, frames.shape, frames.dtype, -p.dither, p.dither
        )
        frames = frames + noise
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    power = jnp.sum(frames * frames, axis=-1)
    log_power = jnp.log(jnp.maximum(power, 1e-10))
    # pre-emphasis with window[0] *= (1 - 0.97) convention
    shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
    pre = frames - 0.97 * shifted
    pre = pre.at[:, 0].set(frames[:, 0] * (1.0 - 0.97))
    _, _, _, hamming = _constants(p)
    return pre * hamming, log_power


@functools.partial(jax.jit, static_argnums=1)
def compute_fbank(
    wave: jnp.ndarray, p: KaldiParams, key: Optional[jax.Array] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(S,) -> (fbank (T, num_mel_bins), log_power (T,))."""
    fb, _, _, _ = _constants(p)
    frames, log_power = _windows(wave, p, key)
    spec = jnp.abs(jnp.fft.rfft(frames, n=p.fft_size)) ** 2
    mel = jnp.dot(
        spec.astype(jnp.float32), fb.T, preferred_element_type=jnp.float32
    )
    return jnp.log(jnp.maximum(mel, 0.1)), log_power


@functools.partial(jax.jit, static_argnums=1)
def compute_mfcc(
    wave: jnp.ndarray, p: KaldiParams, key: Optional[jax.Array] = None
) -> jnp.ndarray:
    """(S,) -> (T, num_ceps) with C0 = log power."""
    _, dct, lifter, _ = _constants(p)
    fbank, log_power = compute_fbank(wave, p, key)
    mfcc = jnp.dot(fbank, dct.T, preferred_element_type=jnp.float32) * lifter
    return mfcc.at[:, 0].set(log_power)


@functools.partial(jax.jit, static_argnums=1)
def compute_spec(
    wave: jnp.ndarray, p: KaldiParams, key: Optional[jax.Array] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(S,) -> (dB spectrum (T, fft/2+1), log_power (T,))."""
    frames, log_power = _windows(wave, p, key)
    mag = jnp.abs(jnp.fft.rfft(frames, n=p.fft_size))
    return 20.0 * jnp.log10(mag / 2e-5), log_power
