"""End-to-end databuild: synthetic corpus -> turn segmentation ->
manifests -> dataset items -> padded batches. Verifies the rate and
length invariants the reference asserts at model time
(lstm_with_sample.py:203-225)."""

import json
import os

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.data.databuild_nx import DataBuilderNX
from multimodalreactiongeneration_tpu.data.dataset import (
    PADDING_VALUE,
    BatchLoader,
    SegmentDatasetNX,
    pad_collate,
    random_split_indices,
)
from multimodalreactiongeneration_tpu.data.segmentation import (
    collect_voiced_section,
    compute_log_power,
    get_utterance_section,
)
from tests.fixtures import AUDIO_CFG, DATA_CFG, MOTION_CFG, make_synthetic_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(str(root), n_sessions=1, seconds=60.0)


@pytest.fixture(scope="module")
def built(corpus, tmp_path_factory):
    cache = tmp_path_factory.mktemp("cache")
    cfg = dict(DATA_CFG, data_dir=corpus)
    builder = DataBuilderNX(cfg, cache_root=str(cache))
    return builder, cfg, str(cache)


def test_vad_finds_bursts(corpus):
    from multimodalreactiongeneration_tpu.utils.wavio import read_wav

    session = os.path.join(corpus, "session00", "data00")
    wave, _ = read_wav(os.path.join(session, "host.wav"))
    lp = compute_log_power(wave[0])
    sections = collect_voiced_section(lp, -4)
    assert len(sections) >= 2  # host has at least 2 bursts in 60 s


def test_turn_sections_alternate(corpus):
    session = os.path.join(corpus, "session00", "data00")
    turn_comp, turn_host = get_utterance_section(
        os.path.join(session, "host.wav"),
        os.path.join(session, "comp.wav"),
        16000,
    )
    assert len(turn_comp) >= 2 and len(turn_host) >= 2
    for turns in (turn_comp, turn_host):
        assert (turns[:, 1] > turns[:, 0]).all()
        # utterances are ~7 s + 1 s margin each side
        assert ((turns[:, 1] - turns[:, 0]) > 5.0).all()


def test_manifests_emitted(built):
    builder, _, _ = built
    files = [
        f
        for f in os.listdir(builder.data_site)
        if f.endswith(".json") and f != "datainfo.json"
    ]
    assert len(files) > 0
    seg = json.loads(
        open(os.path.join(builder.data_site, files[0]), encoding="utf-8").readline()
    )
    assert set(seg) == {
        "partner_motion",
        "partner_audio",
        "self_motion",
        "self_audio",
        "target",
    }
    assert seg["self_audio"] is None  # use_self_audio False
    assert seg["partner_motion"]["seq"]["stride"] == 2


def test_cache_reuse_and_invalidat(built, corpus):
    builder, cfg, cache = built
    again = DataBuilderNX(dict(cfg), cache_root=cache)
    assert again.data_site == builder.data_site  # reused

    changed = dict(cfg, max_len=100)
    rebuilt = DataBuilderNX(changed, cache_root=cache)
    assert rebuilt.data_site != builder.data_site


def test_dataset_items_rate_invariant(built):
    builder, _, _ = built
    ds = SegmentDatasetNX(builder.data_site, MOTION_CFG, AUDIO_CFG)
    assert len(ds) > 0
    ratio = 8
    for i in range(min(len(ds), 4)):
        fbank, m_p, m_s, lf, lmp, lms, target = ds[i]
        assert fbank.shape[-1] == 81 and m_p.shape[-1] == 18
        # the invariant the models assert: audio frames == ratio * motion
        assert fbank.shape[0] == ratio * m_p.shape[0], (
            fbank.shape,
            m_p.shape,
        )
        assert lf.shape[0] == ratio * lmp.shape[0]
        assert m_s.shape[0] == m_p.shape[0]
        assert target.shape[0] == m_s.shape[0]
        assert lmp.shape[0] == lms.shape[0]


def test_pad_collate_invariants(built):
    builder, _, _ = built
    ds = SegmentDatasetNX(builder.data_site, MOTION_CFG, AUDIO_CFG)
    samples = [ds[i] for i in range(min(len(ds), 3))]
    batch = pad_collate(samples, pad_to_multiple=16, ratio=8)
    (fb, lf), (mp, lp), (ms, lms) = batch[0], batch[1], batch[2]
    assert fb.shape[1] == ms.shape[1] * 8
    assert ms.shape[1] % 16 == 0
    # padding value present beyond lengths
    b = int(np.argmin(lms))
    if lms[b] < ms.shape[1]:
        assert (ms[b, lms[b] :] == PADDING_VALUE).all()


def test_batch_loader_and_split(built):
    builder, _, _ = built
    ds = SegmentDatasetNX(builder.data_site, MOTION_CFG, AUDIO_CFG)
    n = len(ds)
    if n < 3:
        pytest.skip("corpus too small for a 3-way split")
    tr, va, te = random_split_indices(n, 0.5, 0.25, seed=1)
    assert len(tr) + len(va) + len(te) == n
    loader = BatchLoader(ds, tr, batch_size=2, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == (len(tr) + 1) // 2


def test_device_batched_collate_matches_host(built):
    builder, _, _ = built
    ds = SegmentDatasetNX(builder.data_site, MOTION_CFG, AUDIO_CFG)
    idx = list(range(min(len(ds), 3)))
    host = pad_collate([ds[i] for i in idx], pad_to_multiple=16, ratio=8)
    from multimodalreactiongeneration_tpu.data.dataset import pad_collate_device

    dev = pad_collate_device(
        [ds.raw_item(i) for i in idx], AUDIO_CFG, pad_to_multiple=16, ratio=8
    )
    for m, (h, d) in enumerate(zip(host, dev)):
        np.testing.assert_array_equal(h[1], d[1])  # lengths
        np.testing.assert_allclose(h[0], d[0], atol=2e-4), m


def test_parallel_launcher():
    from multimodalreactiongeneration_tpu.utils.parallel import (
        parallel_launcher,
    )

    out = parallel_launcher(lambda a, b: a + b, [(1, 2), (3, 4)], unpack=True)
    assert out == [3, 7]
    out = parallel_launcher(lambda a, b: a * b, [(2, 3), (4, 5)], n_jobs=2,
                            unpack=True)
    assert out == [6, 20]
