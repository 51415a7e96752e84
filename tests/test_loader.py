"""BatchLoader length bucketing + PrefetchLoader overlap semantics."""

import threading
import time

import numpy as np

from multimodalreactiongeneration_tpu.data.dataset import (
    BatchLoader,
    PrefetchLoader,
)


class _StubDataset:
    """Only what _epoch_batches needs: lengths per index."""

    def __init__(self, lengths):
        self._lengths = np.asarray(lengths, np.int64)

    def __len__(self):
        return len(self._lengths)

    def segment_lengths(self):
        return self._lengths


def _padded_shapes(batches, lengths, pad=16):
    return {
        int(-(-max(lengths[i] for i in chunk) // pad) * pad)
        for chunk in batches
    }


def test_bucketing_bounds_padded_shapes_and_covers_all():
    rng = np.random.default_rng(0)
    lengths = rng.integers(20, 300, size=256)
    ds = _StubDataset(lengths)
    loader = BatchLoader(
        ds, np.arange(256), batch_size=8, shuffle=True, seed=1,
        bucket_windows=8,
    )
    flat = []
    spreads = []
    batches = loader._epoch_batches()
    for chunk in batches:
        flat.extend(int(i) for i in chunk)
        ls = lengths[chunk]
        spreads.append(ls.max() - ls.min())
    # exact cover
    assert sorted(flat) == list(range(256))
    # batches hold similar lengths: within a 64-sample sorted window an
    # 8-batch spans ~1/8 of the window's range
    plain = BatchLoader(
        ds, np.arange(256), batch_size=8, shuffle=True, seed=1,
        bucket_windows=1,
    )
    plain_spreads = [
        lengths[c].max() - lengths[c].min()
        for c in plain._epoch_batches()
    ]
    assert np.mean(spreads) < 0.5 * np.mean(plain_spreads)

    # padded area (sum of batch_size x rounded-max) shrinks materially:
    # random batches almost always contain one long sample, so nearly
    # every batch pads to the global max
    def padded_area(bs):
        return sum(
            len(c) * -(-max(lengths[i] for i in c) // 16) * 16 for c in bs
        )

    assert padded_area(batches) < 0.8 * padded_area(plain._epoch_batches())


def test_bucketing_varies_across_epochs():
    lengths = np.arange(64)
    ds = _StubDataset(lengths)
    loader = BatchLoader(
        ds, np.arange(64), batch_size=4, shuffle=True, seed=0,
        bucket_windows=4,
    )
    e1 = [tuple(c) for c in loader._epoch_batches()]
    e2 = [tuple(c) for c in loader._epoch_batches()]
    assert e1 != e2


def test_no_shuffle_keeps_given_order_even_with_bucketing_enabled():
    """Eval loaders (shuffle=False) must keep dataset order — consumers
    pair batch rows back to manifests by index (infer/cli.py). Bucketing
    is a training (shuffle=True) feature only."""
    ds = _StubDataset(np.arange(10)[::-1].copy())  # reverse-sorted lengths
    loader = BatchLoader(
        ds, np.arange(10), batch_size=3, shuffle=False, bucket_windows=8
    )
    batches = loader._epoch_batches()
    assert [list(c) for c in batches] == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]


class _SlowLoader:
    """Yields integers, recording when each was produced."""

    def __init__(self, n, delay=0.01):
        self.n = n
        self.delay = delay
        self.produced = []

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            time.sleep(self.delay)
            self.produced.append(i)
            yield i


def test_prefetch_preserves_order_and_runs_ahead():
    inner = _SlowLoader(6)
    pf = PrefetchLoader(inner, depth=3)
    got = []
    ahead = 0
    for item in pf:
        got.append(item)
        time.sleep(0.05)  # slow consumer: producer should run ahead
        ahead = max(ahead, len(inner.produced) - len(got))
    assert got == list(range(6))
    assert len(pf) == 6
    assert ahead >= 2  # overlap actually happened (depth 3 queue filled)


def test_prefetch_propagates_producer_errors():
    class Boom:
        def __iter__(self):
            yield 1
            raise RuntimeError("collate failed")

        def __len__(self):
            return 2

    pf = PrefetchLoader(Boom(), depth=2)
    it = iter(pf)
    assert next(it) == 1
    import pytest

    with pytest.raises(RuntimeError, match="collate failed"):
        next(it)


def test_prefetch_reiterable_across_epochs():
    inner = _SlowLoader(3, delay=0.001)
    pf = PrefetchLoader(inner, depth=2)
    assert list(pf) == [0, 1, 2]
    assert list(pf) == [0, 1, 2]


class _ListLoader:
    """Fixed batch list standing in for a collated BatchLoader."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def test_host_row_shard_reassembles_global_batches():
    from multimodalreactiongeneration_tpu.data.dataset import HostRowShard

    rng = np.random.default_rng(3)
    batches = [
        [
            (rng.normal(size=(6, 10, 4)).astype(np.float32),
             np.full((6,), 10, np.int32)),
            (rng.normal(size=(6, 10, 2)).astype(np.float32),
             np.full((6,), 10, np.int32)),
        ],
        [  # final partial batch: 5 rows -> keep 4, drop 1
            (rng.normal(size=(5, 12, 4)).astype(np.float32),
             np.full((5,), 12, np.int32)),
            (rng.normal(size=(5, 12, 2)).astype(np.float32),
             np.full((5,), 12, np.int32)),
        ],
    ]
    pc = 2
    shards = [
        list(HostRowShard(_ListLoader(batches), pi, pc)) for pi in range(pc)
    ]
    # every host sees the same number of steps with the same shapes
    assert len(shards[0]) == len(shards[1]) == len(batches)
    for b0, b1, full in zip(shards[0], shards[1], batches):
        for (x0, l0), (x1, l1), (xf, lf) in zip(b0, b1, full):
            assert x0.shape == x1.shape
            keep = (xf.shape[0] // pc) * pc
            # interleaving the row slices reconstructs the kept rows
            rebuilt = np.empty((keep,) + xf.shape[1:], xf.dtype)
            rebuilt[0::pc] = x0
            rebuilt[1::pc] = x1
            np.testing.assert_array_equal(rebuilt, xf[:keep])
            np.testing.assert_array_equal(
                np.stack([l0, l1], 1).reshape(-1), lf[:keep]
            )
    # batches smaller than the process count are skipped everywhere
    tiny = [[(np.zeros((1, 4, 2), np.float32), np.ones((1,), np.int32))]]
    assert list(HostRowShard(_ListLoader(tiny), 0, 2)) == []
    assert list(HostRowShard(_ListLoader(tiny), 1, 2)) == []


def test_prefetch_abandoned_consumer_unblocks_producer():
    """Breaking out of a prefetch iterator mid-epoch must release the
    producer thread instead of leaving it blocked on a full queue."""
    n_before = threading.active_count()
    batches = [np.full((2, 2), i, np.float32) for i in range(50)]
    loader = PrefetchLoader(_ListLoader(batches), depth=1)
    it = iter(loader)
    first = next(it)
    np.testing.assert_array_equal(first, batches[0])
    it.close()  # abandon mid-epoch (what an exception in fit() does)
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before
