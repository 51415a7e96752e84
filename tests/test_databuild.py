"""End-to-end databuild: synthetic corpus -> turn segmentation ->
manifests -> dataset items -> padded batches. Verifies the rate and
length invariants the reference asserts at model time
(lstm_with_sample.py:203-225)."""

import json
import os
import subprocess
import sys

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


def test_spec_collate_matches_array_collate(built, monkeypatch):
    """raw_item(audio='spec') + one native batched read must produce the
    identical batch as the per-segment array path — with the native
    library AND with the pure-Python fallback."""
    from multimodalreactiongeneration_tpu.data.dataset import pad_collate_device
    from multimodalreactiongeneration_tpu.utils import native_io

    builder, _, _ = built
    ds = SegmentDatasetNX(builder.data_site, MOTION_CFG, AUDIO_CFG)
    idx = list(range(min(len(ds), 3)))
    via_array = pad_collate_device(
        [ds.raw_item(i) for i in idx], AUDIO_CFG, pad_to_multiple=16, ratio=8
    )
    specs = [ds.raw_item(i, audio="spec") for i in idx]
    assert isinstance(specs[0]["audio_seq"], tuple)
    for forced_fallback in (False, True):
        if forced_fallback:
            monkeypatch.setattr(native_io, "_load", lambda: None)
        via_spec = pad_collate_device(
            specs, AUDIO_CFG, pad_to_multiple=16, ratio=8
        )
        for h, d in zip(via_array, via_spec):
            np.testing.assert_array_equal(h[1], d[1])
            np.testing.assert_array_equal(h[0], d[0])


def test_parallel_launcher():
    from multimodalreactiongeneration_tpu.utils.parallel import (
        parallel_launcher,
    )

    out = parallel_launcher(lambda a, b: a + b, [(1, 2), (3, 4)], unpack=True)
    assert out == [3, 7]
    out = parallel_launcher(lambda a, b: a * b, [(2, 3), (4, 5)], n_jobs=2,
                            unpack=True)
    assert out == [6, 20]


# ---------------------------------------------------------------------------
# Property tests pinning the TRANSCRIBED, SEMANTICS-BEARING functions
# (segmentation.detect_utterance_section / collect_utterance_section and
# DataBuilderNX.process_motion) — their index arithmetic defines the
# dataset, so invariants are asserted over randomized inputs.
# ---------------------------------------------------------------------------


def _random_runs(rng, n, max_gap=120, max_len=80):
    """(n, 2) sorted, non-overlapping voiced runs."""
    starts = np.cumsum(rng.integers(1, max_gap, n))
    lengths = rng.integers(1, max_len, n)
    runs = np.stack([starts, starts + lengths], axis=1)
    return runs.astype(np.int64)


def test_detect_utterance_section_properties():
    from multimodalreactiongeneration_tpu.data.segmentation import (
        detect_utterance_section,
    )

    rng = np.random.default_rng(0)
    fft_rate = 100.0
    for trial in range(25):
        a = _random_runs(rng, int(rng.integers(2, 30)))
        b = _random_runs(rng, int(rng.integers(2, 30)))
        start, end, nfi, nsi = detect_utterance_section(
            a, b, 0, 0, fft_rate,
            pause_with_voice=0.2, pause_without_voice=1.0, min_length=0.6,
        )
        # progress is guaranteed and monotone
        assert nfi >= 1 and nsi >= 0
        assert nfi <= len(a) and nsi <= len(b)
        # the utterance is a union of whole voiced runs of speaker A
        assert start == a[0][0]
        assert end == a[nfi - 1][1]
        assert start <= end
        # merged pauses never reach the hard no-voice threshold
        for j in range(0, nfi - 1):
            gap = a[j + 1][0] - a[j][1]
            assert gap < int(fft_rate * 1.0), (trial, j, gap)


def test_collect_utterance_section_properties():
    from multimodalreactiongeneration_tpu.data.segmentation import (
        collect_utterance_section,
    )

    rng = np.random.default_rng(1)
    fft_rate = 100.0
    min_length = 0.5
    for _ in range(15):
        comp = _random_runs(rng, int(rng.integers(3, 40)))
        host = _random_runs(rng, int(rng.integers(3, 40)))
        uc, uh = collect_utterance_section(
            comp, host, fft_rate, min_length,
            pause_with_voice=0.2, pause_without_voice=1.0,
        )
        for utter, runs in ((uc, comp), (uh, host)):
            # sorted, non-overlapping, each at least min_length
            assert (utter[:, 1] - utter[:, 0] >= fft_rate * min_length).all()
            if len(utter) > 1:
                assert (utter[1:, 0] >= utter[:-1, 1]).all()
            # boundaries coincide with real voiced-run endpoints
            assert set(utter[:, 0]) <= set(runs[:, 0].astype(np.float64))
            assert set(utter[:, 1]) <= set(runs[:, 1].astype(np.float64))


class _BuilderStub:
    fps = 25.0
    sample_rate = 16000
    nfft = 400
    shift = 160
    delta_order = 2
    pred_shift = 2
    leading_len = 24
    min_len = 50
    max_len = 150
    shift_len = 150
    target_shift_real = 2


def test_process_motion_window_properties():
    rng = np.random.default_rng(2)
    stub = _BuilderStub()
    audio_offset = (stub.nfft - stub.shift) + stub.shift * stub.delta_order
    delta_mergin = stub.delta_order * stub.pred_shift
    for _ in range(10):
        n_frames = int(rng.integers(300, 1200))
        ignore = (rng.random(n_frames) < 0.02).astype(np.int32)
        turns = np.sort(rng.uniform(0, n_frames / stub.fps, (3, 2)), axis=1)
        wins = list(
            DataBuilderNX.process_motion(stub, turns, ignore)
        )
        for (s, e, sl, el), (a_s, a_e, a_sl, a_el) in wins:
            length = e - (s + delta_mergin)  # pre-margin window length
            assert stub.min_len - stub.pred_shift <= length <= stub.max_len
            assert length % stub.pred_shift == 0
            # lead sits immediately before the window (pre-margin)
            assert el == s + delta_mergin
            assert el - (sl + delta_mergin) == stub.leading_len
            # audio span maps through the sample-rate grid minus the
            # fbank warmup offset
            assert a_s == int((s + delta_mergin) * stub.sample_rate / stub.fps) - audio_offset
            assert a_e == int(e * stub.sample_rate / stub.fps)
            assert a_el - a_sl > 0
            # no ignored frames inside the window or its lead
            assert ignore[s : e + stub.target_shift_real].sum() == 0
            assert ignore[sl:el].sum() == 0
            assert sl >= 0 and a_sl >= 0


def test_vad_debug_plots_render(tmp_path):
    """--debug-plot VAD figures (reference speech_segmentation.py:209-288,
    380-406): one PNG per full 15 s window under <plot_dir>/<session>/."""
    pytest.importorskip("matplotlib")
    from multimodalreactiongeneration_tpu.data import segmentation

    corpus = tmp_path / "corpus"
    make_synthetic_corpus(str(corpus), n_sessions=1, seconds=40.0)
    session = sorted(corpus.rglob("host.wav"))[0].parent
    plot_dir = tmp_path / "plots"
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "multimodalreactiongeneration_tpu.data.segmentation",
            str(session / "host.wav"),
            str(session / "comp.wav"),
            "--debug-plot",
            "--plot-dir",
            str(plot_dir),
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    sections = json.loads(out.stdout.strip().splitlines()[-1])
    assert "comp" in sections and "host" in sections
    pngs = sorted((plot_dir / session.name).glob("utterance_*.png"))
    # 40 s audio -> 2 full 15 s windows (reference floor(length/15))
    assert [p.name for p in pngs] == [
        "utterance_000_015.png",
        "utterance_015_030.png",
    ]
    assert all(p.stat().st_size > 0 for p in pngs)
