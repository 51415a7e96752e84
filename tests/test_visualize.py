"""Visualization/eval layer: speed.log, rendering, nod plots."""

import pytest
import os

import jax
import numpy as np

from multimodalreactiongeneration_tpu.infer.visualize import (
    destandardize,
    generation_speed_log,
    head_pose_plotter,
    nod_pitch_plot,
    render_comparison,
)
from multimodalreactiongeneration_tpu.models.lstm_with_sampling import LSTMwithSample
from tests.test_generate import _full_batch
from tests.test_streaming_models import LWS_CFG

STATS = {
    "angle_mean": np.array([0.0, 0.0, 0.0]),
    "angle_std": np.array([10.0, 10.0, 10.0]),
    "centroid_mean": np.array([0.5, 0.5, 0.0]),
    "centroid_std": np.array([0.05, 0.05, 0.01]),
}


def test_destandardize():
    motion = np.ones((4, 18), np.float32)
    ang, cen = destandardize(motion, STATS)
    np.testing.assert_allclose(ang, 10.0)
    np.testing.assert_allclose(cen[:, 0], 0.55)


@pytest.mark.slow
def test_speed_log_written(tmp_path):
    model = LSTMwithSample(cfg=LWS_CFG)
    batch = _full_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *batch[:6])
    data = tuple(np.asarray(x) for x in batch)
    log = tmp_path / "speed.log"
    preds = generation_speed_log(
        model, params, "lstm_with_sampling", [data, data], str(log)
    )
    assert len(preds) == 2 and preds[0].shape == (2, 6, 18)
    lines = log.read_text().splitlines()
    assert len(lines) == 2 and "frames/s" in lines[0]


def test_render_and_nod_plot(tmp_path):
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(25, 18)).astype(np.float32)
    true = rng.normal(size=(25, 18)).astype(np.float32)
    out = tmp_path / "frames"
    n = render_comparison(pred, true, STATS, str(out), max_frames=5)
    assert n == 5
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 5

    ratio = nod_pitch_plot(pred, true, STATS, str(tmp_path / "nod.png"))
    assert os.path.exists(tmp_path / "nod.png")
    assert 0.1 < ratio < 10.0


def test_head_pose_plotter_pose_only():
    frame = np.zeros((480, 480, 3), np.uint8)
    out = head_pose_plotter(
        frame,
        {"face": None, "centroid": np.array([0.5, 0.5, 0.0]),
         "angle": np.array([10.0, -5.0, 0.0])},
    )
    assert out.shape == (480, 480, 3)
    assert (out != 0).any()  # something was drawn
    assert (frame == 0).all()  # input frame untouched


def test_head_pose_plotter_face_cloud():
    """Reference visualizer.py:84-123: landmarks re-posed by R.T@face +
    centroid, out-of-range points skipped, nose heading drawn."""
    rng = np.random.default_rng(3)
    face = rng.normal(scale=0.05, size=(20, 3)).astype(np.float32)
    face[5] = [5.0, 5.0, 0.0]  # re-posed far outside [0,1]: must be skipped
    frame = np.zeros((200, 200, 3), np.uint8)
    out = head_pose_plotter(
        frame,
        {"face": face, "centroid": np.array([0.5, 0.5, 0.0]),
         "angle": np.array([0.0, 0.0, 0.0])},
        clr=(50, 255, 50),
    )
    # with identity rotation the cloud lands around the centroid pixel
    green = (out[..., 1] > 200) & (out[..., 0] < 100)
    ys, xs = np.nonzero(green)
    assert len(xs) > 0
    assert 60 < xs.mean() < 140 and 60 < ys.mean() < 140
    # nothing drawn near where the outlier would land if it weren't culled
    assert not green[190:, 190:].any()


def test_pose_strips_shapes_and_cadence(tmp_path):
    """record_statics parity: every 3rd frame, center-cropped middle
    third, 8 tiles per strip (visualize_metaformer.py:152-166)."""
    from multimodalreactiongeneration_tpu.infer.visualize import (
        pose_strips,
        save_pose_strips,
    )

    rng = np.random.default_rng(1)
    motion = rng.normal(size=(30, 18)).astype(np.float32)
    strips = pose_strips(motion, STATS, size=(90, 90))
    # 30 frames -> 10 sampled -> strips of 8 + 2
    assert len(strips) == 2
    assert strips[0].shape == (30, 8 * 30, 3)  # middle third, 8 tiles
    assert strips[1].shape == (30, 2 * 30, 3)

    n = save_pose_strips(motion, motion, STATS, str(tmp_path / "seg"))
    assert n == 4
    names = sorted(os.listdir(tmp_path / "seg"))
    assert names == ["static_0.png", "static_1.png",
                     "t_static_0.png", "t_static_1.png"]


def test_composite_frames_with_source_video(tmp_path):
    """Reference side-by-side: movie frame | pose board, movie frames
    sampled at seq.start + (t+1)*stride, EOF frames -> black panels."""
    from multimodalreactiongeneration_tpu.corpus.video import (
        ArrayVideoReader,
    )
    from multimodalreactiongeneration_tpu.infer.visualize import (
        composite_frames,
        frames_at,
    )

    movie = np.zeros((40, 32, 32, 3), np.uint8)
    for i in range(40):
        movie[i, 0, 0, 0] = i  # stamp index
    src = ArrayVideoReader(movie, fps=25.0)
    idx = [10 + (t + 1) * 2 for t in range(6)] + [99]  # one past EOF
    frames = frames_at(src, idx)
    assert frames[0][0, 0, 0] == 12 and frames[5][0, 0, 0] == 22
    assert frames[6] is None

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(7, 18)).astype(np.float32)
    true = rng.normal(size=(7, 18)).astype(np.float32)
    out = list(composite_frames(pred, true, STATS, frames, face=None))
    assert len(out) == 7
    assert out[0].shape == (32, 64, 3)  # movie | board
    assert out[0][0, 0, 0] == 12  # left half is the real frame
    assert (out[6][:, :32] == 0).all()  # EOF -> black panel
    assert (out[0][:, 32:] != 0).any()  # board was drawn
