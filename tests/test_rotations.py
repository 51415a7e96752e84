"""Rotation kernels: round-trips and parity with a numpy spec re-derivation."""

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.ops import rotations as rot

ALL_ORDERS = [
    "xzx", "xyx", "yxy", "yzy", "zyz", "zxz",
    "xyz", "xzy", "yxz", "yzx", "zyx", "zxy",
]

TAIT_BRYAN = ["xyz", "xzy", "yxz", "yzx", "zyx", "zxy"]


def np_calc_R(lm, img_w, img_h):
    # independent numpy transcription of the spec
    # (/root/reference/mr_gen/utils/tools/rotations.py:6-49)
    scale = np.array([img_w, img_h, img_w])
    p33, p263, p152, p10 = (
        lm[33] * scale,
        lm[263] * scale,
        lm[152] * scale,
        lm[10] * scale,
    )
    x = (p263 - p33) / np.linalg.norm(p263 - p33)
    _y = p152 - p10
    y = _y - x * np.dot(x, _y)
    y = y / np.linalg.norm(y)
    z = np.cross(x, y)
    z = z / np.linalg.norm(y)
    return np.array([x, y, z])


@pytest.mark.parametrize("order", TAIT_BRYAN)
def test_angle_matrix_roundtrip(order):
    rng = np.random.default_rng(3)
    # stay well inside the arctan-safe range the reference assumes
    angles = rng.uniform(-40, 40, size=(64, 3)).astype(np.float32)
    m = rot.angles_to_matrix(angles, order)
    back = np.asarray(rot.matrix_to_angles(m, order))
    np.testing.assert_allclose(back, angles, atol=1e-3)


@pytest.mark.parametrize("order", ALL_ORDERS)
def test_matrices_are_rotations(order):
    rng = np.random.default_rng(4)
    angles = rng.uniform(-40, 40, size=(8, 3)).astype(np.float32)
    m = np.asarray(rot.angles_to_matrix(angles, order))
    eye = np.eye(3, dtype=np.float32)
    for mm in m:
        np.testing.assert_allclose(mm @ mm.T, eye, atol=1e-5)
        assert np.linalg.det(mm) == pytest.approx(1.0, abs=1e-5)


def test_calc_R_matches_numpy_spec():
    rng = np.random.default_rng(5)
    lm = rng.uniform(0.2, 0.8, size=(478, 3)).astype(np.float64)
    ours = np.asarray(rot.calc_R(lm, 1280.0, 720.0))
    ref = np_calc_R(lm, 1280.0, 720.0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_landmarks_to_pose_batched_vs_loop():
    rng = np.random.default_rng(6)
    lms = rng.uniform(0.2, 0.8, size=(10, 478, 3)).astype(np.float32)
    ang, cen = rot.landmarks_to_pose(lms, 1280.0, 720.0)
    ang, cen = np.asarray(ang), np.asarray(cen)
    for t in range(10):
        R = np_calc_R(lms[t].astype(np.float64), 1280.0, 720.0)
        a = np.asarray(rot.matrix_to_angles(R.astype(np.float32), "xyz"))
        np.testing.assert_allclose(ang[t], a, atol=1e-3)
        np.testing.assert_allclose(cen[t], lms[t].mean(axis=0), atol=1e-5)


def test_synthetic_pose_recovery():
    # A frontal face rotated by known Euler angles should decompose back.
    rng = np.random.default_rng(7)
    base = rng.uniform(-0.3, 0.3, size=(478, 3))
    # plant the 4 anchor landmarks of an upright frontal face
    base[rot.LM_EYE_R] = [-0.2, 0.0, 0.0]
    base[rot.LM_EYE_L] = [0.2, 0.0, 0.0]
    base[rot.LM_FOREHEAD] = [0.0, -0.25, 0.0]
    base[rot.LM_CHIN] = [0.0, 0.25, 0.0]

    frontal_R = np.asarray(rot.calc_R(base.astype(np.float32), 1.0, 1.0))
    # rotate all landmarks by a known rotation; calc_R should compose
    true = np.array([10.0, -15.0, 5.0], dtype=np.float32)
    M = np.asarray(rot.angles_to_matrix(true, "xyz"))
    rotated = base @ M  # each row p -> p @ M, so face axes a^T -> a^T M
    R2 = np.asarray(rot.calc_R(rotated.astype(np.float32), 1.0, 1.0))
    # rows of calc_R are face axes: R2 = R1 @ M  =>  M = R1^T @ R2
    rel = frontal_R.T @ R2
    rec = np.asarray(rot.matrix_to_angles(rel.astype(np.float32), "xyz"))
    np.testing.assert_allclose(rec, true, atol=0.5)
