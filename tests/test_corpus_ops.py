"""Corpus ops: alignment recovers known shifts; extract_angle_cent;
rename/check/anomaly/statistics round trips."""

import json
import os

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.corpus import alignment, ops
from multimodalreactiongeneration_tpu.corpus.extract_angle_cent import (
    collect_angle_cent,
    fix_data,
)
from multimodalreactiongeneration_tpu.data.head_io import (
    HeadFrame,
    write_head_frame,
)
from multimodalreactiongeneration_tpu.ops.xcorr import align_shift
from multimodalreactiongeneration_tpu.utils.wavio import read_wav, write_wav

SR = 16000


def _noise_burst_wave(rng, seconds=8.0):
    wave = np.zeros(int(seconds * SR), np.float32)
    wave[SR : 3 * SR] = 0.4 * rng.standard_normal(2 * SR).astype(np.float32)
    wave[5 * SR : 6 * SR] = 0.3 * rng.standard_normal(SR).astype(np.float32)
    return wave


def test_align_shift_recovers_known_lag():
    rng = np.random.default_rng(0)
    base = _noise_burst_wave(rng)
    for true_shift in (0, 1234, -777, 16000):
        if true_shift >= 0:
            shifted = np.concatenate([np.zeros(true_shift, np.float32), base])
        else:
            shifted = base[-true_shift:]
        est = align_shift(base, shifted, SR)
        assert abs(est - true_shift) <= 1, (true_shift, est)


def test_align_session_trims_to_common_span(tmp_path):
    rng = np.random.default_rng(1)
    comp = _noise_burst_wave(rng)
    host = _noise_burst_wave(np.random.default_rng(2))
    mix = (comp + host) * 0.5
    session = tmp_path / "s0"
    session.mkdir()
    # comp delayed 0.2 s, host early 0.1 s relative to the mix
    write_wav(str(session / "comp.wav"), np.concatenate([np.zeros(3200, np.float32), comp])[None], SR)
    write_wav(str(session / "host.wav"), host[1600:][None], SR)
    write_wav(str(session / "pair.wav"), mix[None], SR)

    out = tmp_path / "aligned" / "s0"
    shifts = alignment.align_session(str(session), str(out))
    assert abs(shifts["comp"] - 3200) <= 1
    assert abs(shifts["host"] + 1600) <= 1
    c, _ = read_wav(str(out / "comp.wav"))
    h, _ = read_wav(str(out / "host.wav"))
    m, _ = read_wav(str(out / "pair.wav"))
    assert c.shape == h.shape == m.shape
    # aligned channels correlate at zero lag now
    assert abs(align_shift(m[0], c[0], SR)) <= 1
    # skip-if-populated resume
    assert alignment.align_session(str(session), str(out)) is None


def test_load_m4a_decodes_and_decimates():
    """Reference load_m4a rule (data_alignment.py:44-53): int16 scale,
    keep every other sample, half the native rate."""
    pcm = np.arange(-8, 8, dtype="<i2")

    def decoder(cmd):
        if cmd[0] == "ffprobe":
            return b"32000\n"
        assert cmd[0] == "ffmpeg" and "s16le" in cmd
        return pcm.tobytes()

    wav, sr = alignment.load_m4a("/fake/session.m4a", decoder=decoder)
    assert sr == 16000
    np.testing.assert_allclose(wav, pcm[::2].astype(np.float32) / 32768.0)


def test_align_session_m4a_mix_and_video_trim(tmp_path):
    """Full reference alignment parity: the session mix arrives as .m4a
    (no pair.wav), a movie sits alongside, planted shifts recovered, the
    movie trimmed over the aligned span (data_alignment.py:240-287)."""
    rng = np.random.default_rng(7)
    comp = _noise_burst_wave(rng)
    host = _noise_burst_wave(np.random.default_rng(8))
    mix = (comp + host) * 0.5
    session = tmp_path / "s1"
    session.mkdir()
    write_wav(
        str(session / "comp.wav"),
        np.concatenate([np.zeros(3200, np.float32), comp])[None], SR,
    )
    write_wav(str(session / "host.wav"), host[1600:][None], SR)
    (session / "session.m4a").write_bytes(b"not a real m4a")
    (session / "movie.mp4").write_bytes(b"not a real mp4")

    # fake ffmpeg decoder: emits the mix as s16le at 2x rate so the [::2]
    # decimation lands back on the 16 kHz grid
    pcm2x = (
        np.repeat(np.clip(mix, -1, 1), 2) * 32767
    ).astype("<i2")

    def decoder(cmd):
        return b"32000\n" if cmd[0] == "ffprobe" else pcm2x.tobytes()

    trims = []

    def video_runner(cmd, check):
        trims.append(cmd)

    out = tmp_path / "aligned" / "s1"
    shifts = alignment.align_session(
        str(session), str(out), decoder=decoder, video_runner=video_runner
    )
    assert abs(shifts["comp"] - 3200) <= 1
    assert abs(shifts["host"] + 1600) <= 1
    c, _ = read_wav(str(out / "comp.wav"))
    m, _ = read_wav(str(out / "pair.wav"))
    assert c.shape == m.shape
    # the movie trim ran once over the aligned span
    (cmd,) = trims
    assert cmd[cmd.index("-i") + 1] == str(session / "movie.mp4")
    assert cmd[-1] == str(out / "movie.mp4")
    with open(out / "alignment.json") as f:
        meta = json.load(f)
    start_s = float(cmd[cmd.index("-ss") + 1])
    stop_s = float(cmd[cmd.index("-to") + 1])
    assert abs(start_s - meta["start_mix"] / SR) < 1e-6
    assert abs(stop_s - (meta["start_mix"] + meta["span"]) / SR) < 1e-6


def _head_dir(tmp_path, who="comp", frames=260, gap=(100, 105), long_gap=None):
    rng = np.random.default_rng(3)
    d = tmp_path / who
    d.mkdir(parents=True, exist_ok=True)
    traj = np.cumsum(rng.normal(size=(frames, 6)), axis=0)
    missing = set(range(*gap))
    if long_gap:
        missing |= set(range(*long_gap))
    for t in range(frames):
        if t in missing:
            write_head_frame(str(d / f"{who}_{t:05d}.head"), t, None)
        else:
            frame = HeadFrame(
                angle=traj[t, :3],
                centroid=traj[t, 3:],
                frame_no=t,
                fps=25.0,
                angle_mean=np.zeros(3),
                angle_std=np.ones(3),
                centroid_mean=np.zeros(3),
                centroid_std=np.ones(3),
            )
            write_head_frame(str(d / f"{who}_{t:05d}.head"), t, frame)
    return d


def test_extract_angle_cent_interpolates_and_splits(tmp_path):
    session = tmp_path / "corpus" / "data00"
    _head_dir(session, "comp", frames=400, gap=(100, 105), long_gap=(250, 280))
    write_wav(str(session / "comp.wav"), np.zeros((1, SR), np.float32), SR)

    out = tmp_path / "npz"
    collect_angle_cent(str(tmp_path / "corpus"), str(out))
    files = sorted(os.listdir(out / "data00"))
    npz = [f for f in files if f.endswith(".npz")]
    assert len(npz) == 2  # split at the 30-frame gap, short gap interpolated
    with np.load(out / "data00" / npz[0]) as z:
        sec = z["section"]
        assert sec[0] == 0 and sec[1] == 250
        assert np.isfinite(z["angle"]).all()
        # interpolated frames lie between their endpoints
        a99, a105 = z["angle"][99], z["angle"][105]
        mid = z["angle"][102]
        lo, hi = np.minimum(a99, a105), np.maximum(a99, a105)
        assert ((mid >= lo - 1e-9) & (mid <= hi + 1e-9)).all()
    assert "comp.wav" in files


def test_fix_data_gap_at_start_not_interpolated():
    angle = [None, None, np.ones(3), np.ones(3)]
    cent = [None, None, np.ones(3), np.ones(3)]
    out = fix_data({"angle": list(angle), "centroid": list(cent)})
    assert out["angle"][0] is None and out["angle"][1] is None


def test_rename_and_participants(tmp_path):
    s0 = tmp_path / "d01"
    s0.mkdir()
    for name in ("movie_xxx.mp4", "c-01_alice.wav", "h-02_bob.wav", "pair_raw.wav"):
        (s0 / name).write_bytes(b"x")
    table = ops.rename_sessions(str(tmp_path))
    assert set(os.listdir(s0)) == {
        "movie.mp4", "comp.wav", "host.wav", "pair.wav", "participant.json",
    }
    info = json.loads((s0 / "participant.json").read_text())
    assert info["comp"] == "alice" and info["host"] == "bob"
    assert table == {"bob": 0, "alice": 1}
    summary = ops.collect_participant_info(str(tmp_path))
    assert summary["alice"]["comp"] == 1


def test_check_audio_and_stereo(tmp_path):
    s = tmp_path / "s"
    s.mkdir()
    write_wav(str(s / "comp.wav"), np.zeros((1, SR), np.float32), SR)
    write_wav(str(s / "host.wav"), np.zeros((1, SR), np.float32), SR)
    write_wav(str(s / "bad.wav"), np.zeros((2, SR), np.float32), SR)  # stereo
    report = ops.check_audio(str(tmp_path))
    assert len(report["ok"]) == 2 and len(report["bad"]) == 1
    out = ops.make_stereo(str(s), str(tmp_path / "stereo"))
    data, sr = read_wav(out)
    assert data.shape[0] == 2 and sr == SR


def test_anomaly_and_statistics(tmp_path):
    d = _head_dir(tmp_path, "host", frames=50, gap=(10, 13))
    result = tmp_path / "anomaly.jsonl"
    ops.anomaly_search(str(tmp_path), str(result))
    rec = json.loads(result.read_text().splitlines()[0])
    assert rec["count"] == 3 and rec["anomaly"] == [10, 11, 12]

    a_mean, a_std, c_mean, c_std = ops.compute_head_statistics(str(d))
    assert a_mean.shape == (3,) and (a_std > 0).all()
    ops.stamp_statistics(str(d))
    from multimodalreactiongeneration_tpu.data.head_io import load_head_file

    _, frame = load_head_file(str(d / "host_00000.head"))
    np.testing.assert_allclose(frame.angle_mean, a_mean)


def test_angle_jump_statistics_flags_glitch(tmp_path):
    """A planted 30-degree FaceMesh glitch at frame 25 must be the only
    outlier (reference calc_delta_statistics.py:38-46 semantics: norm of
    consecutive detected-frame angle diffs, threshold in degrees)."""
    d = _head_dir(tmp_path, "host", frames=50, gap=(10, 13))
    from multimodalreactiongeneration_tpu.data.head_io import (
        load_head_file,
        write_head_frame,
    )

    idx, frame = load_head_file(str(d / "host_00025.head"))
    frame.angle = frame.angle + np.array([30.0, 0.0, 0.0])
    write_head_frame(str(d / "host_00025.head"), idx, frame)

    recs = list(ops.angle_jump_statistics(str(tmp_path), threshold=8.0,
                                          hist_dir=str(tmp_path / "hist")))
    assert len(recs) == 1
    rec = recs[0]
    assert rec["frames"] == 47  # 50 minus the 3-frame gap
    flagged = {o["frame"] for o in rec["outliers"]}
    assert flagged == {25, 26}  # jump into and out of the glitch
    assert (tmp_path / "hist" / "host_angle_jumps.png").exists()


def test_quarantine_and_backfill(tmp_path):
    # a session with >400 misses gets quarantined
    d = _head_dir(tmp_path / "bad_session", "comp", frames=500, gap=(0, 450))
    good = _head_dir(tmp_path / "good_session", "comp", frames=50, gap=(5, 8))
    report = tmp_path / "anomaly.jsonl"
    ops.anomaly_search(str(tmp_path), str(report))
    moved = ops.quarantine_sessions(
        str(tmp_path), str(report), str(tmp_path / "quarantine"), max_misses=400
    )
    assert len(moved) == 1
    assert (tmp_path / "quarantine" / "bad_session").is_dir()
    assert (tmp_path / "good_session").is_dir()

    # backfill: delete two files from the good dir, restore placeholders
    os.remove(good / "comp_00020.head")
    os.remove(good / "comp_00021.head")
    n = ops.backfill_missing_frames(str(good))
    assert n == 2
    from multimodalreactiongeneration_tpu.data.head_io import load_head_file

    idx, frame = load_head_file(str(good / "comp_00020.head"))
    assert idx == 20 and frame is None


def test_grad_accumulation_optimizer():
    import jax
    import jax.numpy as jnp
    import optax

    from multimodalreactiongeneration_tpu.train.optim import (
        build_optimizer,
        set_learning_rate,
    )
    from multimodalreactiongeneration_tpu.utils.config import from_dict

    cfg = from_dict(dict(use_optimizer="adam", momentum=0.9, weight_decay=0.0,
                         lr=0.1, use_lr_sched=True, batch_size=1, max_epochs=2))
    opt = build_optimizer(cfg, accumulate_grad_batches=2)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    state = set_learning_rate(state, 0.05)
    g = {"w": jnp.ones(3)}
    up1, state = opt.update(g, state, params)
    # first micro-batch: no update applied yet
    assert float(jnp.abs(up1["w"]).sum()) == 0.0
    up2, state = opt.update(g, state, params)
    assert float(jnp.abs(up2["w"]).sum()) > 0.0


def test_align_shift_large_lag_unequal_lengths():
    """A short capture matching deep into a long track: the circular
    correlation index exceeds n_fft//2 and must unwrap by len(a), not by
    the FFT midpoint (which misreads it as a bogus near lag)."""
    rng = np.random.default_rng(7)
    base = np.zeros(60 * SR, np.float32)
    for start in rng.integers(0, 59 * SR, size=40):  # burst structure
        base[start : start + SR // 2] += (
            0.5 * rng.standard_normal(SR // 2)
        ).astype(np.float32)
    lag = 40 * SR  # envelope index far beyond n_fft//2
    short = base[lag : lag + 10 * SR]
    est = align_shift(base, short, SR)
    # short's content begins `lag` samples into base -> shift it by -lag
    assert abs(est + lag) <= 2 * (SR // 100), est


def test_best_lag_index_exceeding_half_fft():
    from multimodalreactiongeneration_tpu.ops.xcorr import best_lag

    rng = np.random.default_rng(8)
    a = (0.2 * rng.standard_normal(7000)).astype(np.float32)
    b = a[6000:6500]  # circular index 6000 > n_fft//2 = 4096, < len(a)
    assert best_lag(a, b) == -6000


def _monolithic_head(path, n=6, none_at=(2,)):
    """Write a pre-split-era monolithic .head pickle (a bare list of
    frames, reference patch_for_save input format)."""
    import pickle

    frames = []
    for i in range(n):
        if i in none_at:
            frames.append(None)
        else:
            frames.append(HeadFrame(
                angle=np.array([float(i), 0.0, 0.0]),
                centroid=np.array([0.0, float(i), 0.0]),
                time=-1.0, frame_no=-1, fps=0.0,
            ))
    with open(path, "wb") as f:
        pickle.dump(frames, f)
    return frames


def test_migrate_split_head(tmp_path):
    """patch_for_save semantics: monolithic .head -> per-frame (i, d)
    pickles in a same-named dir, wavs copied, None frames preserved."""
    from multimodalreactiongeneration_tpu.data.head_io import load_head_file

    src = tmp_path / "corpus" / "s0"
    src.mkdir(parents=True)
    _monolithic_head(src / "comp.head", n=5, none_at=(3,))
    (src / "comp.wav").write_bytes(b"RIFFfake")
    out = tmp_path / "migrated"
    n = ops.migrate_split_head(str(tmp_path / "corpus"), str(out))
    assert n == 5
    head_dir = out / "s0" / "comp"
    files = sorted(os.listdir(head_dir))
    assert files == [f"comp_{str(i).zfill(5)}.head" for i in range(5)]
    idx, frame = load_head_file(str(head_dir / files[1]))
    assert idx == 1 and float(frame.angle[0]) == 1.0
    idx3, frame3 = load_head_file(str(head_dir / files[3]))
    assert idx3 == 3 and frame3 is None
    assert (out / "s0" / "comp.wav").read_bytes() == b"RIFFfake"


def test_migrate_stamp_fps(tmp_path):
    """patch_for_faceadpter semantics: drop None frames, restamp
    time/frame_no/fps from the ORIGINAL index, monolithic output."""
    from multimodalreactiongeneration_tpu.data.head_io import loads_head

    src = tmp_path / "corpus" / "s0"
    src.mkdir(parents=True)
    _monolithic_head(src / "comp.head", n=4, none_at=(1,))
    out = tmp_path / "migrated"
    n = ops.migrate_stamp_fps(str(tmp_path / "corpus"), str(out), fps=25.0)
    assert n == 1
    frames = loads_head((out / "s0" / "comp.head").read_bytes())
    assert len(frames) == 3  # None dropped
    # frame originally at index 2 keeps ITS index stamps
    assert frames[1].frame_no == 2 and frames[1].time == 2 / 25.0
    assert frames[1].fps == 25.0


def test_migrate_copy_wavs(tmp_path):
    """patch_for_wav semantics: host/comp wavs mirrored, existing files
    and non-host/comp wavs skipped."""
    src = tmp_path / "formd" / "s0"
    src.mkdir(parents=True)
    (src / "host.wav").write_bytes(b"h")
    (src / "comp.wav").write_bytes(b"c")
    (src / "pair.wav").write_bytes(b"p")  # not host/comp -> skipped
    out = tmp_path / "features"
    (out / "s0").mkdir(parents=True)
    (out / "s0" / "host.wav").write_bytes(b"OLD")  # existing -> kept
    n = ops.migrate_copy_wavs(str(tmp_path / "formd"), str(out))
    assert n == 1
    assert (out / "s0" / "host.wav").read_bytes() == b"OLD"
    assert (out / "s0" / "comp.wav").read_bytes() == b"c"
    assert not (out / "s0" / "pair.wav").exists()
