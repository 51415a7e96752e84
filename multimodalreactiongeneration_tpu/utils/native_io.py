"""ctypes binding for the native IO library (native/mrgen_io.cpp).

The C++ layer batches the dataloader's hot path: n wav slices decoded
into one contiguous float32 buffer per call. Falls back transparently to
the pure-Python wavio reader when the shared library isn't built
(build with ``make -C native``; auto-built on first use when g++ exists).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmrgen_io.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # run make unconditionally (a no-op when the .so is current): an
    # exists-only check would silently keep loading a stale binary after
    # mrgen_io.cpp edits. Failure only matters if no library exists.
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mrgen_wav_info.restype = ctypes.c_int
    lib.mrgen_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mrgen_read_f32.restype = ctypes.c_long
    lib.mrgen_read_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mrgen_read_batch_f32.restype = ctypes.c_long
    lib.mrgen_read_batch_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mrgen_read_batch_i16.restype = ctypes.c_long
    lib.mrgen_read_batch_i16.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_short),
    ]
    lib.mrgen_frame_energy.restype = ctypes.c_long
    lib.mrgen_frame_energy.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_slice(path: str, start: int, frames: int) -> np.ndarray:
    """Mono float32 slice, zero-padded past EOF (channel 0)."""
    lib = _load()
    if lib is None:
        from multimodalreactiongeneration_tpu.utils.wavio import read_wav

        data, _ = read_wav(path, start, frames)
        out = np.zeros(frames, np.float32)
        out[: data.shape[1]] = data[0]
        return out
    out = np.empty(frames, np.float32)
    rc = lib.mrgen_read_f32(
        path.encode(), start, frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise OSError(f"native read failed ({rc}) for {path}")
    return out


def read_batch(
    paths: List[str], starts: List[int], frames: int, dtype=np.float32
) -> np.ndarray:
    """(n, frames) batch in one native call.

    ``dtype=np.int16`` returns raw PCM16 samples (channel 0, zero-padded
    past EOF) with NO float conversion — the train collate uploads these
    directly and scales by 1/2**15 in-graph (ops/dsp.py), which is exact
    in float32, so the int16 path is bit-identical at half the bytes.
    """
    if dtype == np.int16:
        lib = _load()
        if lib is None:
            from multimodalreactiongeneration_tpu.utils.wavio import read_wav

            out = np.zeros((len(paths), frames), np.int16)
            for i, (p, s) in enumerate(zip(paths, starts)):
                data, _ = read_wav(p, s, frames, dtype=np.int16)
                out[i, : data.shape[1]] = data[0]
            return out
        blob, offsets, starts_arr = _pack_paths(paths, starts)
        out = np.empty((len(paths), frames), np.int16)
        rc = lib.mrgen_read_batch_i16(
            blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            starts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            frames,
            len(paths),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        )
        if rc != 0:
            raise OSError(f"native batch read failed at segment {-rc - 1}")
        return out

    lib = _load()
    if lib is None:
        return np.stack([read_slice(p, s, frames) for p, s in zip(paths, starts)])
    blob, offsets, starts_arr = _pack_paths(paths, starts)
    out = np.empty((len(paths), frames), np.float32)
    rc = lib.mrgen_read_batch_f32(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        starts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        frames,
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise OSError(f"native batch read failed at segment {-rc - 1}")
    return out


def _pack_paths(paths: List[str], starts: List[int]):
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(len(paths), np.int64)
    pos = 0
    for i, p in enumerate(paths):
        offsets[i] = pos
        pos += len(p.encode()) + 1
    return blob, offsets, np.asarray(starts, np.int64)


def frame_energy_native(
    wave: np.ndarray, n_fft: int = 400, hop: int = 160
) -> Optional[np.ndarray]:
    """Framed energy via the native kernel, or None without the .so.

    Production caller: data/segmentation.compute_log_power (the databuild
    VAD front half) — it logs this and falls back to its numpy sliding
    window when the library isn't built.
    """
    lib = _load()
    if lib is None:
        return None
    wave = np.ascontiguousarray(wave, np.float32)
    num = max((len(wave) - n_fft) // hop + 1, 0)
    out = np.empty(num, np.float32)
    got = lib.mrgen_frame_energy(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(wave),
        n_fft,
        hop,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:got]


def frame_energy(wave: np.ndarray, n_fft: int = 400, hop: int = 160):
    """Framed energy: native kernel, numpy fallback."""
    out = frame_energy_native(wave, n_fft, hop)
    if out is not None:
        return out
    from multimodalreactiongeneration_tpu.data.segmentation import (
        _log_power_numpy,
    )

    return np.exp(_log_power_numpy(np.ascontiguousarray(wave, np.float32), n_fft, hop))
