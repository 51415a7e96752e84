"""L4 data loading: manifest-driven datasets + static-shape batching.

Behavior-matched to the reference NX dataset/datamodule
(/root/reference/mr_gen/model/lstmformer/dataloader.py):
  * __getitem__ returns the 7-tuple (fbank_p, motion_p, motion_s,
    lead_fbank_p, lead_motion_p, lead_motion_s, target); target is
    motion_self shifted by target.shift_input_seq frames (:87-89)
  * padding value -100 (the "never in data" sentinel, :16-17)
  * 80/10/10 random split (:155-171)

TPU-first re-design of collation: instead of pack/pad to the ragged batch
max (a new XLA shape every step), sequences pad to a BUCKET length
(pad_to_multiple), so the jitted train step compiles a handful of shapes
total (SURVEY.md §7 hard-part #1).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from multimodalreactiongeneration_tpu.data.features import (
    AudioFeatureExtractor,
    MotionFeatureExtractor,
    MotionFeatureExtractorNX,
)

PADDING_VALUE = -100.0

Sample = Tuple[np.ndarray, ...]
Batch = List[Tuple[np.ndarray, np.ndarray]]  # [(data (B,T,D), lengths (B,))]


class SegmentDatasetNX:
    """Reads one-line-JSON segment manifests (reference dataloader.py:20-111)."""

    def __init__(self, dataset_path: str, motion_cfg, audio_cfg):
        self.dataset_path = dataset_path
        self.data_list = sorted(
            os.path.join(dataset_path, p)
            for p in os.listdir(dataset_path)
            if p.endswith(".json") and p != "datainfo.json"
        )
        self.audio = AudioFeatureExtractor(audio_cfg)
        self.motion = MotionFeatureExtractorNX(motion_cfg)

    def __len__(self) -> int:
        return len(self.data_list)

    def __getitem__(self, index: int) -> Sample:
        with open(self.data_list[index], "r", encoding="utf-8") as f:
            jdic = json.loads(f.readline())

        pm, pa = jdic["partner_motion"], jdic["partner_audio"]
        sm, tgt = jdic["self_motion"], jdic["target"]
        off_p, off_s = pm["offset"], sm["offset"]

        fbank = self.audio(pa["path"], pa["seq"]["start"], pa["seq"]["end"])
        motion_p = self.motion(
            pm["path"],
            pm["seq"]["start"] - off_p,
            pm["seq"]["end"] - off_p,
            pm["seq"]["stride"],
        )
        motion_s = self.motion(
            sm["path"],
            sm["seq"]["start"] - off_s,
            sm["seq"]["end"] - off_s,
            sm["seq"]["stride"],
        )
        lead_fbank = self.audio(pa["path"], pa["lead"]["start"], pa["lead"]["end"])
        lead_motion_p = self.motion(
            pm["path"],
            pm["lead"]["start"] - off_p,
            pm["lead"]["end"] - off_p,
            pm["lead"]["stride"],
        )
        lead_motion_s = self.motion(
            sm["path"],
            sm["lead"]["start"] - off_s,
            sm["lead"]["end"] - off_s,
            sm["lead"]["stride"],
        )

        shift = tgt["shift_input_seq"]
        target = motion_s[shift:]
        motion_s = motion_s[: len(motion_s) - shift]

        return (
            fbank,
            motion_p,
            motion_s,
            lead_fbank,
            lead_motion_p,
            lead_motion_s,
            target,
        )


class WindowDataset:
    """v1 fixed-shape windows for SimpleLSTM (reference
    simple_lstm/dataloader.py:16-61): (fbank, motion_context, motion_target)."""

    def __init__(self, dataset_path: str, data_cfg, audio_cfg):
        self.dataset_path = dataset_path
        self.data_list = sorted(
            os.path.join(dataset_path, p)
            for p in os.listdir(dataset_path)
            if p.endswith(".json") and p != "datainfo.json"
        )
        self.audio = AudioFeatureExtractor(audio_cfg)
        self.motion = MotionFeatureExtractor(data_cfg)

    def __len__(self) -> int:
        return len(self.data_list)

    def __getitem__(self, index: int):
        with open(self.data_list[index], "r", encoding="utf-8") as f:
            jdic = json.loads(f.readline())
        fbank = self.audio(
            jdic["wav_file"], jdic["audio"]["start"], jdic["audio"]["end"]
        )
        context = self.motion(jdic["head_dir"], **jdic["context"])
        target = self.motion(jdic["head_dir"], **jdic["target"])
        return fbank, context, target


def stack_collate(samples: Sequence[Sample]) -> Tuple[np.ndarray, ...]:
    """Fixed-shape stack (reference simple_lstm/dataloader.py:56-61)."""
    return tuple(
        np.stack([s[m] for s in samples], axis=0)
        for m in range(len(samples[0]))
    )


class WindowBatchLoader:
    """Epoch iterator for fixed-shape v1 windows."""

    def __init__(self, dataset, indices, batch_size, shuffle=True, seed=0,
                 drop_last=False):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __iter__(self):
        order = self.indices.copy()
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
            self._epoch += 1
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            yield stack_collate([self.dataset[int(j)] for j in chunk])


def random_split_indices(
    n: int, train_rate: float, valid_rate: float, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """80/10/10-style split (reference dataloader.py:159-171)."""
    train_size = int(train_rate * n)
    valid_size = int(valid_rate * n)
    test_size = n - train_size - valid_size
    if test_size <= 0:
        raise ValueError(f"test size is negative or zero: {test_size}")
    perm = np.random.default_rng(seed).permutation(n)
    return (
        perm[:train_size],
        perm[train_size : train_size + valid_size],
        perm[train_size + valid_size :],
    )


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pad_collate(
    samples: Sequence[Sample],
    pad_to_multiple: int = 16,
    ratio: int = 8,
    pad_value: float = PADDING_VALUE,
) -> Batch:
    """Pad each modality to a bucketed length (motion-frame aligned).

    Motion modalities (indices 1, 2, 6) pad to the same bucketed motion
    length Tm; the audio modality (0) pads to Tm * ratio so the model's
    rate invariant (sampled audio == motion frames) survives padding.
    Leads are constant-length by construction (fixed leading_len); they
    pad to the batch-max lead motion length, audio tied at ratio x, with
    NO bucket rounding — rounding leads independently would break the tie.
    Returns [(data, lengths), ...] like the reference collate (:114-121).
    """
    n_modal = len(samples[0])
    motion_like = {1, 2, 6}
    audio_like = {0}
    lead_audio_like = {3}
    lead_motion_like = {4, 5}

    tm = max(s[2].shape[0] for s in samples)
    tm = _round_up(tm, pad_to_multiple)
    lead_tm = max(s[4].shape[0] for s in samples)

    out: Batch = []
    for m in range(n_modal):
        arrs = [s[m] for s in samples]
        lengths = np.array([a.shape[0] for a in arrs], np.int64)
        if m in motion_like:
            max_len = tm
        elif m in audio_like:
            max_len = tm * ratio
        elif m in lead_motion_like:
            max_len = lead_tm
        elif m in lead_audio_like:
            max_len = lead_tm * ratio
        else:
            max_len = _round_up(max(lengths), pad_to_multiple)
        dim = arrs[0].shape[-1]
        batch = np.full((len(arrs), max_len, dim), pad_value, np.float32)
        for b, a in enumerate(arrs):
            batch[b, : a.shape[0]] = a
        out.append((batch, lengths))
    return out


class BatchLoader:
    """Minimal epoch iterator: shuffle, batch, collate (host-side).

    Length-bucketed shuffling: samples are grouped so each batch has
    similar motion lengths, minimizing padding waste and XLA shape count.
    """

    def __init__(
        self,
        dataset: SegmentDatasetNX,
        indices: np.ndarray,
        batch_size: int,
        pad_to_multiple: int = 16,
        ratio: int = 8,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.pad_to_multiple = pad_to_multiple
        self.ratio = ratio
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        order = self.indices.copy()
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            samples = [self.dataset[int(j)] for j in chunk]
            yield pad_collate(
                samples, self.pad_to_multiple, self.ratio
            )
