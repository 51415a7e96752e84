"""HBM-resident corpus audio: upload once, slice on device every epoch.

Measured motivation (benchmarks/loader_profile.py, 8x300s corpus, B16):
the steady train epoch is host-link bandwidth, not compute — the legacy
collate moved 264 MB/epoch (f32 wave up + feature readback + re-upload)
for 11.1 s epochs; keeping features on device + int16 wave upload cut
that to 64.6 MB / 2.1 s. This module removes the remaining per-epoch
audio traffic: each wav uploads ONCE as a padded int16 bank, and every
batch gathers its slices with a vmapped ``dynamic_slice`` on device —
zero audio bytes over the host link after the bank upload.

The gather is bit-identical to the host read path: bank rows are
zero-padded past each file's data (= read-past-EOF zeros), each gathered
row is zeroed past its true slice length in-graph (= the collate's tail
rule), and the PCM16 -> float32 scale by 1/2**15 happens in the fused
fbank graph exactly as for uploaded int16 waves (ops/dsp.py).

Sizing: the bank is a rectangular (n_files, max_file_len + max_slice)
int16 array. ``build`` refuses (returns None) when that exceeds
``budget_bytes`` — corpora larger than the budget fall back to the
per-batch native int16 read transparently (data/dataset.py).

Reference analog: none — the reference re-reads wavs through soundfile
every epoch (mr_gen/utils/preprocess/audio.py:24-26). This is the
TPU-idiomatic replacement: the dataset lives next to the MXU.
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_gather_jit = None


def _ensure_gather():
    global _gather_jit
    if _gather_jit is None:
        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnums=4)
        def gather(bank, idx, starts, true_lens, needed):
            def one(i, s, tl):
                row = jax.lax.dynamic_slice(bank, (i, s), (1, needed))[0]
                return jnp.where(
                    jnp.arange(needed) < tl, row, jnp.int16(0)
                )

            return jax.vmap(one)(idx, starts, true_lens)

        _gather_jit = gather
    return _gather_jit


class DeviceAudioCache:
    """int16 wav bank on the accelerator + jitted batch slice gather."""

    def __init__(self, bank, index, file_lens):
        self._bank = bank            # (n_files, s_pad) int16 device array
        self._index = index          # path -> row
        self._file_lens = file_lens  # true sample counts (diagnostics)

    @property
    def nbytes(self) -> int:
        return self._bank.size * 2

    @classmethod
    def build(
        cls,
        paths: Sequence[str],
        max_slice_samples: int,
        budget_bytes: int,
    ) -> Optional["DeviceAudioCache"]:
        """Upload ``paths`` (channel 0) once; None if over budget."""
        import jax
        import jax.numpy as jnp

        from multimodalreactiongeneration_tpu.utils import wavio

        paths = sorted(set(paths))
        if not paths:
            return None
        lens = [wavio.wav_info(p)[1] for p in paths]
        s_pad = max(lens) + int(max_slice_samples)
        total = len(paths) * s_pad * 2
        if total > budget_bytes:
            logger.info(
                "audio cache disabled: %d files x %d samples = %.0f MB "
                "exceeds budget %.0f MB",
                len(paths), s_pad, total / 1e6, budget_bytes / 1e6,
            )
            return None
        host = np.zeros((len(paths), s_pad), np.int16)
        for i, p in enumerate(paths):
            data, _ = wavio.read_wav(p, 0, -1, dtype=np.int16)
            host[i, : data.shape[1]] = data[0]
        bank = jax.device_put(jnp.asarray(host))
        logger.info(
            "audio cache: %d files, %.0f MB resident on device",
            len(paths), total / 1e6,
        )
        return cls(bank, {p: i for i, p in enumerate(paths)},
                   np.asarray(lens))

    @classmethod
    def build_for_dataset(
        cls,
        dataset,
        audio_cfg: dict,
        pad_to_multiple: int,
        ratio: int,
        budget_bytes: int,
    ) -> Optional["DeviceAudioCache"]:
        """Size the slice bound from the dataset's longest segment."""
        lengths = dataset.segment_lengths()
        if len(lengths) == 0:
            return None
        tm_max = int(lengths.max())
        tm_max = (
            (tm_max + pad_to_multiple - 1) // pad_to_multiple
        ) * pad_to_multiple
        delta = int(audio_cfg.get("delta_order", 2))
        max_slice = (
            (tm_max * ratio + delta - 1) * int(audio_cfg["shift"])
            + int(audio_cfg["nfft"])
        )
        return cls.build(dataset.audio_paths(), max_slice, budget_bytes)

    def gather(
        self,
        paths: List[str],
        starts: List[int],
        true_lens: List[int],
        samples_needed: int,
    ):
        """(B, samples_needed) int16 device rows, or None on a miss.

        None (unknown path, or a slice that could run past the bank's
        right edge — dynamic_slice would CLAMP the start and silently
        shift the window) tells the caller to use the host read path.
        """
        try:
            idx = np.array([self._index[p] for p in paths], np.int32)
        except KeyError:
            return None
        if max(starts) + samples_needed > self._bank.shape[1]:
            return None
        return _ensure_gather()(
            self._bank,
            idx,
            np.asarray(starts, np.int32),
            np.asarray(true_lens, np.int32),
            samples_needed,
        )
