"""Micro-benchmarks (reference mr_gen/scripts/measure_time.py:15-113:
.head pickle load latency + fbank extraction latency).

Run: python benchmarks/micro.py
Prints one JSON line per benchmark.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import jax
import numpy as np

# allow running from anywhere without installation
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_head_load(n_files: int = 200) -> dict:
    from multimodalreactiongeneration_tpu.data.head_io import (
        HeadFrame,
        load_head_file,
        write_head_frame,
    )

    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        for i in range(n_files):
            frame = HeadFrame(
                angle=rng.normal(size=3),
                centroid=rng.normal(size=3),
                frame_no=i,
                fps=25.0,
            )
            write_head_frame(os.path.join(d, f"x_{i:05d}.head"), i, frame)
        t0 = time.perf_counter()
        for i in range(n_files):
            load_head_file(os.path.join(d, f"x_{i:05d}.head"))
        dt = (time.perf_counter() - t0) / n_files
    return {"bench": "head_pickle_load", "ms_per_file": round(dt * 1e3, 4)}


def bench_fbank(iters: int = 100) -> dict:
    """3-second slice fbank extraction (reference measured 1000 iters of
    torchaudio MelSpectrogram on CPU)."""
    from multimodalreactiongeneration_tpu.ops import dsp

    wave = np.random.default_rng(0).standard_normal(48000).astype(np.float32)
    params = dsp.FbankParams()
    out = dsp.logmel_with_power(wave, params)
    float(out[0, 0])  # compile + sync
    t0 = time.perf_counter()
    o = out
    for _ in range(iters):
        o = dsp.logmel_with_power(wave + o[0, 0] * 1e-3, params)
    float(o[0, 0])
    dt = (time.perf_counter() - t0) / iters
    return {"bench": "fbank_3s_slice", "ms_per_call": round(dt * 1e3, 4)}


def bench_wav_slice(iters: int = 200) -> dict:
    from multimodalreactiongeneration_tpu.utils import native_io, wavio

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.wav")
        sig = np.zeros((1, 16000 * 30), np.float32)
        wavio.write_wav(path, sig, 16000)
        t0 = time.perf_counter()
        for i in range(iters):
            native_io.read_slice(path, i * 100, 32000)
        dt = (time.perf_counter() - t0) / iters
    return {
        "bench": "wav_2s_slice_read",
        "ms_per_call": round(dt * 1e3, 4),
        "native": native_io.available(),
    }


if __name__ == "__main__":
    for result in (bench_head_load(), bench_fbank(), bench_wav_slice()):
        print(json.dumps(result))
