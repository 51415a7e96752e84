"""DeviceAudioCache: HBM-resident audio bank vs the host read path.

The cached gather must be BIT-identical to the native/Python batched
read (data/dataset.py pad_collate_device): same EOF zero-padding, same
past-true-length tail zeroing, same in-graph PCM16 scale.
"""

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.data.audio_cache import DeviceAudioCache
from multimodalreactiongeneration_tpu.data.dataset import (
    BatchLoader,
    SegmentDatasetNX,
    pad_collate_device,
)

from tests.fixtures import AUDIO_CFG, MOTION_CFG
from tests.test_databuild import built, corpus  # noqa: F401


@pytest.fixture()
def ds(built):  # noqa: F811
    builder, _, _ = built
    return SegmentDatasetNX(builder.data_site, MOTION_CFG, AUDIO_CFG)


def _build_cache(ds, budget=1 << 30):
    return DeviceAudioCache.build_for_dataset(
        ds, AUDIO_CFG, pad_to_multiple=16, ratio=8, budget_bytes=budget
    )


def test_cached_collate_bit_matches_host_read(ds):
    idx = list(range(min(len(ds), 3)))
    specs = [ds.raw_item(i, audio="spec") for i in idx]
    via_read = pad_collate_device(specs, AUDIO_CFG, pad_to_multiple=16, ratio=8)
    cache = _build_cache(ds)
    assert cache is not None
    via_cache = pad_collate_device(
        specs, AUDIO_CFG, pad_to_multiple=16, ratio=8, audio_cache=cache
    )
    for (h, hl), (d, dl) in zip(via_read, via_cache):
        np.testing.assert_array_equal(hl, dl)
        np.testing.assert_array_equal(np.asarray(h), np.asarray(d))


def test_gather_zeroes_eof_and_tails(ds, tmp_path):
    from multimodalreactiongeneration_tpu.utils import wavio

    sr = 16000
    sig = np.linspace(-0.5, 0.5, sr // 2, dtype=np.float32)  # 0.5 s file
    p = str(tmp_path / "short.wav")
    wavio.write_wav(p, sig[None], sr)
    cache = DeviceAudioCache.build([p], max_slice_samples=sr, budget_bytes=1 << 30)
    # slice starts inside the file but runs past EOF; true_len shorter still
    needed = sr // 4
    start = sr // 2 - needed // 2
    true_len = needed // 2 + 100
    rows = np.asarray(cache.gather([p], [start], [true_len], needed))
    ref_f32, _ = wavio.read_wav(p, start, needed)
    ref = np.zeros(needed, np.int16)
    avail = sig.shape[0] - start
    ref[:avail] = np.round(ref_f32[0][:avail] * 32768).astype(np.int16)
    ref[true_len:] = 0
    np.testing.assert_array_equal(rows[0], ref)


def test_budget_and_miss_fallbacks(ds):
    assert _build_cache(ds, budget=8) is None  # over budget -> None
    cache = _build_cache(ds)
    assert cache.gather(["/nonexistent.wav"], [0], [10], 100) is None
    # a slice that would clamp at the bank edge refuses rather than shift
    huge = cache._bank.shape[1] + 1
    some = next(iter(cache._index))
    assert cache.gather([some], [cache._bank.shape[1]], [10], 1) is None
    assert cache.gather([some], [0], [huge], huge) is None


def test_batch_loader_uses_cache(ds):
    cache = _build_cache(ds)
    loader = BatchLoader(
        ds, np.arange(len(ds)), batch_size=2, shuffle=False,
        audio_cfg=AUDIO_CFG, audio_cache=cache,
    )
    ref_loader = BatchLoader(
        ds, np.arange(len(ds)), batch_size=2, shuffle=False,
        audio_cfg=AUDIO_CFG,
    )
    for via_cache, via_read in zip(loader, ref_loader):
        for (h, hl), (d, dl) in zip(via_read, via_cache):
            np.testing.assert_array_equal(hl, dl)
            np.testing.assert_array_equal(np.asarray(h), np.asarray(d))
