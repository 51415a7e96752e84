"""FFT cross-correlation lag search for corpus audio alignment.

Replaces the reference's coarse->fine grid matching
(/root/reference/mr_gen/utils/data_analysis/data_alignment.py:92-227):
an O(N*W) Python dot-product loop over RMS grids at 1/10 s then 1/100 s,
followed by a sample-exact search. The TPU-native version computes the
exact argmax-lag cross-correlation in O(N log N) with one jitted rFFT
pass over RMS envelopes (coarse) and a windowed exact pass (fine) —
the same two-stage structure, each stage a single fused kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rms_envelope(x: np.ndarray, grid: int) -> np.ndarray:
    """Reference make_grid_single: RMS over non-overlapping grid windows."""
    n = len(x) // grid
    if n == 0:
        return np.zeros((0,), np.float32)
    w = x[: n * grid].reshape(n, grid).astype(np.float64)
    return np.sqrt((w**2).mean(axis=-1)).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _xcorr_best_lag(
    a: jnp.ndarray, b: jnp.ndarray, n_fft: int, pos_max: int
) -> jnp.ndarray:
    """argmax_l sum_t a[t] * b[t - l]; returns signed lag of b vs a.

    With zero padding to n_fft >= len(a)+len(b), circular indices
    0..len(a)-1 are the valid positive lags and n_fft-len(b)+1..n_fft-1
    wrap to the negative lags -(len(b)-1)..-1 — so the unwrap threshold
    is len(a) (passed as pos_max), NOT n_fft//2: for unequal-length
    signals a midpoint split misreads large true positive lags as
    negative."""
    fa = jnp.fft.rfft(a, n_fft)
    fb = jnp.fft.rfft(b, n_fft)
    corr = jnp.fft.irfft(fa * jnp.conj(fb), n_fft)
    idx = jnp.argmax(corr)
    return jnp.where(idx >= pos_max, idx - n_fft, idx)


def best_lag(a: np.ndarray, b: np.ndarray) -> int:
    """Delay of b relative to a: returns s such that b[t] ~= a[t - s]
    (positive s: b starts later than a)."""
    n = int(2 ** np.ceil(np.log2(len(a) + len(b))))
    return -int(_xcorr_best_lag(jnp.asarray(a), jnp.asarray(b), n, len(a)))


def align_shift(
    target0: np.ndarray,
    target1: np.ndarray,
    sample_rate: int = 16000,
    coarse_div: int = 100,
) -> int:
    """Two-stage shift estimate (reference get_time_shift :179-227).

    Returns samples to shift target1 by (positive: target1 starts later).
    Stage 1: exact FFT xcorr on 1/coarse_div-second RMS envelopes.
    Stage 2: exact FFT xcorr on a +-2 coarse-cell window at full rate.
    """
    grid = max(sample_rate // coarse_div, 1)
    e0 = rms_envelope(target0, grid)
    e1 = rms_envelope(target1, grid)
    coarse = best_lag(e0, e1) * grid

    # fine: residual lag between the coarsely-aligned signals over the
    # loudest ~10 s window (exact, sample resolution)
    # b delayed by ~coarse: content b[coarse + t] ~ a[t]
    start0 = max(-coarse, 0)
    start1 = max(coarse, 0)
    n = min(len(target0) - start0, len(target1) - start1)
    if n <= 4 * grid:
        return coarse
    seg0 = target0[start0 : start0 + n]
    seg1 = target1[start1 : start1 + n]
    window = min(n, 10 * sample_rate)
    center = int(np.argmax(np.abs(seg0)))
    lo = max(min(center - window // 2, n - window), 0)
    fine = best_lag(seg0[lo : lo + window], seg1[lo : lo + window])
    if abs(fine) > 2 * grid:
        # the residual can only be sub-cell after a correct coarse pass;
        # a larger "fine" lag means the windowed xcorr locked onto a
        # repeat period (music bed, repeated utterance) — keep coarse
        return coarse
    return int(coarse + fine)
