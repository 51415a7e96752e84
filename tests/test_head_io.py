"""Reference .head compatibility + golden rotation check on sample.head."""

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.data.head_io import (
    HeadFrame,
    load_head_file,
    write_head_frame,
)
from multimodalreactiongeneration_tpu.ops import rotations as rot

SAMPLE = "/root/reference/data/sample.head"


def test_reads_reference_sample_head():
    idx, frame = load_head_file(SAMPLE)
    assert idx == 1
    assert frame.face.shape == (478, 3)
    assert frame.angle.shape == (3,)
    assert frame.fps == 25.0


def test_golden_angle_decomposition_vs_reference():
    """The reference computed frame.angle = matrix_to_angles(frame.R) with
    its numpy code (adapter.py:52-56); ours must reproduce it exactly."""
    _, frame = load_head_file(SAMPLE)
    ours = np.asarray(rot.matrix_to_angles(frame.R.astype(np.float64), "xyz"))
    np.testing.assert_allclose(ours, frame.angle, atol=1e-5)


def test_roundtrip_write_read(tmp_path):
    frame = HeadFrame(
        angle=np.array([1.0, 2.0, 3.0]),
        centroid=np.array([0.5, 0.5, 0.0]),
        frame_no=7,
        fps=25.0,
    )
    p = tmp_path / "x_00007.head"
    write_head_frame(str(p), 7, frame)
    idx, back = load_head_file(str(p))
    assert idx == 7
    np.testing.assert_array_equal(back.angle, frame.angle)


def test_none_frame_raises(tmp_path):
    from multimodalreactiongeneration_tpu.data.head_io import load_head_frame

    p = tmp_path / "x_00001.head"
    write_head_frame(str(p), 1, None)
    with pytest.raises(ValueError):
        load_head_frame(str(p))
