"""L1 vision pipeline with an injected landmarker (mediapipe absent)."""

import os

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.corpus.landmarks import (
    HeadPoseEstimation,
    estimate_and_stamp,
)
from multimodalreactiongeneration_tpu.corpus.video import (
    ArrayVideoReader,
    open_video,
    split_frame,
)
from multimodalreactiongeneration_tpu.data.head_io import load_head_file
from multimodalreactiongeneration_tpu.ops import rotations as rot


def synthetic_face(angles_deg, center=(0.5, 0.5, 0.0)):
    """478 landmarks of a canonical face rotated by the given Euler angles."""
    rng = np.random.default_rng(0)
    base = rng.uniform(-0.15, 0.15, (478, 3))
    base[rot.LM_EYE_R] = [-0.2, 0.0, 0.0]
    base[rot.LM_EYE_L] = [0.2, 0.0, 0.0]
    base[rot.LM_FOREHEAD] = [0.0, -0.25, 0.0]
    base[rot.LM_CHIN] = [0.0, 0.25, 0.0]
    M = np.asarray(rot.angles_to_matrix(np.asarray(angles_deg, np.float32), "xyz"))
    return (base @ M + np.asarray(center)).astype(np.float32)


def fake_landmarker_factory(per_frame_angles, none_at=()):
    def landmarker(frame):
        idx = int(frame[0, 0, 0])  # frame index smuggled in pixel 0
        if idx in none_at:
            return None
        return synthetic_face(per_frame_angles[idx])

    return landmarker


def _video(n):
    frames = np.zeros((n, 8, 8, 3), np.uint8)
    for i in range(n):
        frames[i, 0, 0, 0] = i
    return ArrayVideoReader(frames, fps=25.0)


def test_estimation_writes_heads_and_batched_pose(tmp_path):
    angles = [(5.0 * i, -2.0 * i, 0.0) for i in range(6)]
    est = HeadPoseEstimation(fake_landmarker_factory(angles, none_at=(3,)),
                             chunk=4)
    n = est(_video(6), str(tmp_path), "host")
    assert n == 6
    idx, f0 = load_head_file(str(tmp_path / "host_00000.head"))
    assert f0 is not None and f0.fps == 25.0
    _, f3 = load_head_file(str(tmp_path / "host_00003.head"))
    assert f3 is None  # undetected frame persisted as None

    # pose recovered per frame should track the planted rotation ordering
    _, f2 = load_head_file(str(tmp_path / "host_00002.head"))
    _, f5 = load_head_file(str(tmp_path / "host_00005.head"))
    assert abs(f5.angle[0]) > abs(f2.angle[0])


def test_resume_skips_existing(tmp_path):
    angles = [(0.0, 0.0, 0.0)] * 4
    lm = fake_landmarker_factory(angles)
    calls = []

    def counting(frame):
        calls.append(1)
        return lm(frame)

    est = HeadPoseEstimation(counting)
    est(_video(4), str(tmp_path), "host")
    first = len(calls)
    est2 = HeadPoseEstimation(counting, redo=False)
    est2(_video(4), str(tmp_path), "host")
    assert len(calls) == first  # nothing re-estimated


def test_estimate_and_stamp(tmp_path):
    angles = [(2.0 * i, -1.5 * i + 1.0, 0.5 * i - 1.0) for i in range(5)]
    n = estimate_and_stamp(
        _video(5), str(tmp_path), "comp",
        landmarker=fake_landmarker_factory(angles),
    )
    assert n == 5
    _, f = load_head_file(str(tmp_path / "comp_00000.head"))
    assert (f.angle_std > 0).all()


def test_video_sources(tmp_path):
    frames = np.random.default_rng(0).integers(0, 255, (3, 4, 6, 3), np.uint8)
    v = open_video(frames)
    assert len(v) == 3 and v.size == (6, 4)
    left, right = split_frame(frames[0])
    assert left.shape == (4, 3, 3) and right.shape == (4, 3, 3)

    # image-sequence source
    from PIL import Image

    d = tmp_path / "seq"
    d.mkdir()
    for i, fr in enumerate(frames):
        Image.fromarray(fr).save(d / f"f_{i:03d}.png")
    v2 = open_video(str(d))
    assert len(v2) == 3
    got = np.stack(list(v2))
    np.testing.assert_array_equal(got, frames)


@pytest.mark.slow
def test_visualize_mode_renders_overlay_movie(tmp_path):
    """visualize=True writes <name>_visualized.mp4 with one frame per
    processed frame (reference landmark_estimation.py:115-139)."""
    from tests.test_video import fake_encoder_cmd

    angles = [(2.0 * i, 0.0, 0.0) for i in range(5)]
    est = HeadPoseEstimation(
        fake_landmarker_factory(angles, none_at=(2,)),
        chunk=3,
        visualize=True,
        encoder_cmd=fake_encoder_cmd,
    )
    n = est(_video(5), str(tmp_path), "host")
    assert n == 5
    movie = tmp_path / "host_visualized.mp4"
    # every frame (detected or not) lands in the overlay movie as rawvideo
    raw = movie.read_bytes()
    assert len(raw) == 5 * 8 * 8 * 3
    # stream order preserved across the None-frame passthrough: each
    # source frame carries its index at pixel (0,0,0)
    frames = np.frombuffer(raw, np.uint8).reshape(5, 8, 8, 3)
    assert list(frames[:, 0, 0, 0]) == [0, 1, 2, 3, 4]


def test_process_corpus_splits_and_estimates(tmp_path):
    """Corpus driver (reference video_process.py): per session, the
    side-by-side movie yields comp (left) and host (right) .head files
    with statistics stamped; sample-mode overlay movies rendered."""
    from multimodalreactiongeneration_tpu.corpus.landmarks import (
        process_corpus,
    )
    from multimodalreactiongeneration_tpu.corpus.video import (
        ArrayVideoReader,
    )
    from tests.test_video import fake_encoder_cmd

    corpus = tmp_path / "raw"
    for s in ("data01", "data02"):
        (corpus / s).mkdir(parents=True)
        (corpus / s / "movie.mp4").write_bytes(b"fake")

    # fake reader: 6 side-by-side frames, left half brighter than right
    frames = np.zeros((6, 8, 16, 3), np.uint8)
    frames[:, :, :8] = 200  # comp side
    frames[:, :, 8:] = 40   # host side

    def open_fake(path):
        return ArrayVideoReader(frames.copy(), fps=25.0)

    calls = []

    def landmarker(frame):
        calls.append(int(frame[0, 0, 0]))
        return synthetic_face((5.0, 0.0, 0.0))

    out = tmp_path / "features"
    import multimodalreactiongeneration_tpu.corpus.landmarks as lm

    orig = lm.HeadPoseEstimation

    class PatchedEst(orig):
        def __init__(self, *a, **kw):
            kw.setdefault("encoder_cmd", fake_encoder_cmd)
            super().__init__(*a, **kw)

    lm.HeadPoseEstimation = PatchedEst
    try:
        n = process_corpus(
            str(corpus), str(out), est_fps=25.0, visualize="sample",
            pnum=2, landmarker=landmarker, open_video_fn=open_fake,
        )
    finally:
        lm.HeadPoseEstimation = orig

    assert n == 2 * 2 * 6  # 2 sessions x 2 participants x 6 frames
    # both halves were actually fed (comp bright=200, host dark=40)
    assert set(calls) == {200, 40}
    for s in ("data01", "data02"):
        # the <session>/<who>/ layout extract_angle_cent consumes, with
        # per-participant statistics stamped
        comp = sorted(os.listdir(out / s / "comp"))
        host = sorted(os.listdir(out / s / "host"))
        assert "comp_00000.head" in comp and "host_00005.head" in host
        from multimodalreactiongeneration_tpu.data.head_io import (
            load_head_file,
        )

        _, f = load_head_file(str(out / s / "comp" / "comp_00000.head"))
        assert (f.angle_std >= 0).all()
    # sample mode: overlays only for session index 0 (i % pnum == 0)
    assert (out / "data01" / "comp" / "comp_visualized.mp4").exists()
    assert not (out / "data02" / "comp" / "comp_visualized.mp4").exists()


def test_landmarks_to_extract_pipeline(tmp_path):
    """The corpus driver's output feeds extract_angle_cent directly:
    movie -> .head dirs -> npz motion segments (the full L1 pipeline)."""
    from multimodalreactiongeneration_tpu.corpus.extract_angle_cent import (
        collect_angle_cent,
    )
    from multimodalreactiongeneration_tpu.corpus.landmarks import (
        process_corpus,
    )
    from multimodalreactiongeneration_tpu.corpus.video import (
        ArrayVideoReader,
    )

    corpus = tmp_path / "raw"
    (corpus / "data01").mkdir(parents=True)
    (corpus / "data01" / "movie.mp4").write_bytes(b"fake")
    frames = np.zeros((130, 8, 16, 3), np.uint8)

    angles = [(3.0 * (i % 5), 0.0, 0.0) for i in range(130)]
    n_call = [0]

    def landmarker(frame):
        lm = synthetic_face(angles[n_call[0] % len(angles)])
        n_call[0] += 1
        return lm

    feats = tmp_path / "features"
    n = process_corpus(
        str(corpus), str(feats), landmarker=landmarker,
        open_video_fn=lambda p: ArrayVideoReader(frames.copy(), fps=25.0),
    )
    assert n == 2 * 130

    npz_root = tmp_path / "npz"
    collect_angle_cent(str(feats), str(npz_root))
    out = sorted(os.listdir(npz_root / "data01"))
    assert any(f.startswith("comp") and f.endswith(".npz") for f in out)
    assert any(f.startswith("host") and f.endswith(".npz") for f in out)
