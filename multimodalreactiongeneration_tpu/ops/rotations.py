"""Batched head-pose rotation kernels.

Re-design of /root/reference/mr_gen/utils/tools/rotations.py (calc_R :6-49,
matrix<->Euler for 12 orders :96-293), which runs frame-at-a-time NumPy in
Python loops. Here every function is pure jax.numpy over a leading batch
axis, so a whole dialog's landmark stream converts in one fused XLA call.

Parity notes:
  * angles are degrees; decomposition uses arctan (NOT arctan2), matching
    the reference's gimbal-unsafe but spec-defining choice
    (rotations.py:227-285).
  * calc_R reproduces the reference's Gram-Schmidt including its quirk of
    normalizing z by |y| (a no-op numerically since |y|=1 after its own
    normalization, rotations.py:44-45) — kept as-is.
  * landmark indices: 33/263 (eye corners), 152 (chin), 10 (forehead) —
    MediaPipe FaceMesh canonical points (rotations.py:14-17).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEG2RAD = jnp.pi / 180.0
RAD2DEG = 180.0 / jnp.pi

LM_EYE_R = 33
LM_EYE_L = 263
LM_CHIN = 152
LM_FOREHEAD = 10


def calc_R(landmarks: jnp.ndarray, img_w: float, img_h: float) -> jnp.ndarray:
    """Face-frame rotation matrix from (..., 478, 3) normalized landmarks.

    R rows are the face-local x (eye line), y (vertical), z axes in image
    space; R de-rotates the face to frontal (reference rotations.py:6-49).
    Batched over any leading dims.
    """
    scale = jnp.asarray([img_w, img_h, img_w], dtype=landmarks.dtype)
    p33 = landmarks[..., LM_EYE_R, :] * scale
    p263 = landmarks[..., LM_EYE_L, :] * scale
    p152 = landmarks[..., LM_CHIN, :] * scale
    p10 = landmarks[..., LM_FOREHEAD, :] * scale

    _x = p263 - p33
    x = _x / jnp.linalg.norm(_x, axis=-1, keepdims=True)
    _y = p152 - p10
    xy = x * jnp.sum(x * _y, axis=-1, keepdims=True)
    y = _y - xy
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    z = jnp.cross(x, y)
    z = z / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.stack([x, y, z], axis=-2)


def centroid(landmarks: jnp.ndarray) -> jnp.ndarray:
    """Mean landmark = face centroid (reference adapter.py:22-24)."""
    return jnp.mean(landmarks, axis=-2)


# ---------------------------------------------------------------------------
# Euler <-> matrix, all 12 orders, degrees, batched.
# Index helpers: matrix element r{i}{j} is m[..., i-1, j-1].
# ---------------------------------------------------------------------------

_ORDERS = (
    "xzx", "xyx", "yxy", "yzy", "zyz", "zxz",
    "xyz", "xzy", "yxz", "yzx", "zyx", "zxy",
)


def angles_to_matrix(angles: jnp.ndarray, order: str = "xyz") -> jnp.ndarray:
    """(..., 3) degrees -> (..., 3, 3) rotation matrix (reference :96-212)."""
    t = angles * DEG2RAD
    c1, c2, c3 = jnp.cos(t[..., 0]), jnp.cos(t[..., 1]), jnp.cos(t[..., 2])
    s1, s2, s3 = jnp.sin(t[..., 0]), jnp.sin(t[..., 1]), jnp.sin(t[..., 2])

    if order == "xyz":
        rows = (
            (c2 * c3, -c2 * s3, s2),
            (c1 * s3 + c3 * s1 * s2, c1 * c3 - s1 * s2 * s3, -c2 * s1),
            (s1 * s3 - c1 * c3 * s2, c3 * s1 + c1 * s2 * s3, c1 * c2),
        )
    elif order == "xzy":
        rows = (
            (c2 * c3, -s2, c2 * s3),
            (s1 * s3 + c1 * c3 * s2, c1 * c2, c1 * s2 * s3 - c3 * s1),
            (c3 * s1 * s2 - c1 * s3, c2 * s1, c1 * c3 + s1 * s2 * s3),
        )
    elif order == "yxz":
        rows = (
            (c1 * c3 + s1 * s2 * s3, c3 * s1 * s2 - c1 * s3, c2 * s1),
            (c2 * s3, c2 * c3, -s2),
            (c1 * s2 * s3 - c3 * s1, c1 * c3 * s2 + s1 * s3, c1 * c2),
        )
    elif order == "yzx":
        rows = (
            (c1 * c2, s1 * s3 - c1 * c3 * s2, c3 * s1 + c1 * s2 * s3),
            (s2, c2 * c3, -c2 * s3),
            (-c2 * s1, c1 * s3 + c3 * s1 * s2, c1 * c3 - s1 * s2 * s3),
        )
    elif order == "zyx":
        rows = (
            (c1 * c2, c1 * s2 * s3 - c3 * s1, s1 * s3 + c1 * c3 * s2),
            (c2 * s1, c1 * c3 + s1 * s2 * s3, c3 * s1 * s2 - c1 * s3),
            (-s2, c2 * s3, c2 * c3),
        )
    elif order == "zxy":
        rows = (
            (c1 * c3 - s1 * s2 * s3, -c2 * s1, c1 * s3 + c3 * s1 * s2),
            (c3 * s1 + c1 * s2 * s3, c1 * c2, s1 * s3 - c1 * c3 * s2),
            (-c2 * s3, s2, c2 * c3),
        )
    elif order == "xzx":
        rows = (
            (c2, -c3 * s2, s2 * s3),
            (c1 * s2, c1 * c2 * c3 - s1 * s3, -c3 * s1 - c1 * c2 * s3),
            (s1 * s2, c1 * s3 + c2 * c3 * s1, c1 * c3 - c2 * s1 * s3),
        )
    elif order == "xyx":
        rows = (
            (c2, s2 * s3, c3 * s2),
            (s1 * s2, c1 * c3 - c2 * s1 * s3, -c1 * s3 - c2 * c3 * s1),
            (-c1 * s2, c3 * s1 + c1 * c2 * s3, c1 * c2 * c3 - s1 * s3),
        )
    elif order == "yxy":
        rows = (
            (c1 * c3 - c2 * s1 * s3, s1 * s2, c1 * s3 + c2 * c3 * s1),
            (s2 * s3, c2, -c3 * s2),
            (-c3 * s1 - c1 * c2 * s3, c1 * s2, c1 * c2 * c3 - s1 * s3),
        )
    elif order == "yzy":
        rows = (
            (c1 * c2 * c3 - s1 * s3, -c1 * s2, c3 * s1 + c1 * c2 * s3),
            (c3 * s2, c2, s2 * s3),
            (-c1 * s3 - c2 * c3 * s1, s1 * s2, c1 * c3 - c2 * s1 * s3),
        )
    elif order == "zyz":
        rows = (
            (c1 * c2 * c3 - s1 * s3, -c3 * s1 - c1 * c2 * s3, c1 * s2),
            (c1 * s3 + c2 * c3 * s1, c1 * c3 - c2 * s1 * s3, s1 * s2),
            (-c3 * s2, s2 * s3, c2),
        )
    elif order == "zxz":
        rows = (
            (c1 * c3 - c2 * s1 * s3, -c1 * s3 - c2 * c3 * s1, s1 * s2),
            (c3 * s1 + c1 * c2 * s3, c1 * c2 * c3 - s1 * s3, -c1 * s2),
            (s2 * s3, c3 * s2, c2),
        )
    else:
        raise ValueError(f"invalid order {order!r}")

    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def matrix_to_angles(m: jnp.ndarray, order: str = "xyz") -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) degrees (reference :215-293, arctan-based)."""
    r = lambda i, j: m[..., i - 1, j - 1]

    if order == "xyz":
        t1 = jnp.arctan(-r(2, 3) / r(3, 3))
        t2 = jnp.arctan(r(1, 3) * jnp.cos(t1) / r(3, 3))
        t3 = jnp.arctan(-r(1, 2) / r(1, 1))
    elif order == "xzy":
        t1 = jnp.arctan(r(3, 2) / r(2, 2))
        t2 = jnp.arctan(-r(1, 2) * jnp.cos(t1) / r(2, 2))
        t3 = jnp.arctan(r(1, 3) / r(1, 1))
    elif order == "yxz":
        t1 = jnp.arctan(r(1, 3) / r(3, 3))
        t2 = jnp.arctan(-r(2, 3) * jnp.cos(t1) / r(3, 3))
        t3 = jnp.arctan(r(2, 1) / r(2, 2))
    elif order == "yzx":
        t1 = jnp.arctan(-r(3, 1) / r(1, 1))
        t2 = jnp.arctan(r(2, 1) * jnp.cos(t1) / r(1, 1))
        t3 = jnp.arctan(-r(2, 3) / r(2, 2))
    elif order == "zyx":
        t1 = jnp.arctan(r(2, 1) / r(1, 1))
        t2 = jnp.arctan(-r(3, 1) * jnp.cos(t1) / r(1, 1))
        t3 = jnp.arctan(r(3, 2) / r(3, 3))
    elif order == "zxy":
        t1 = jnp.arctan(-r(1, 2) / r(2, 2))
        t2 = jnp.arctan(r(3, 2) * jnp.cos(t1) / r(2, 2))
        t3 = jnp.arctan(-r(3, 1) / r(3, 3))
    elif order == "xzx":
        t1 = jnp.arctan(r(3, 1) / r(2, 1))
        t2 = jnp.arctan(r(2, 1) / (r(1, 1) * jnp.cos(t1)))
        t3 = jnp.arctan(-r(1, 3) / r(1, 2))
    elif order == "xyx":
        t1 = jnp.arctan(-r(2, 1) / r(3, 1))
        t2 = jnp.arctan(-r(3, 1) / (r(1, 1) * jnp.cos(t1)))
        t3 = jnp.arctan(r(1, 2) / r(1, 3))
    elif order == "yxy":
        t1 = jnp.arctan(r(1, 2) / r(3, 2))
        t2 = jnp.arctan(r(3, 2) / (r(2, 2) * jnp.cos(t1)))
        t3 = jnp.arctan(-r(2, 1) / r(2, 3))
    elif order == "yzy":
        t1 = jnp.arctan(-r(3, 2) / r(1, 2))
        t2 = jnp.arctan(-r(1, 2) / (r(2, 2) * jnp.cos(t1)))
        t3 = jnp.arctan(r(2, 3) / r(2, 1))
    elif order == "zyz":
        t1 = jnp.arctan(r(2, 3) / r(1, 3))
        t2 = jnp.arctan(r(1, 3) / (r(3, 3) * jnp.cos(t1)))
        t3 = jnp.arctan(-r(3, 2) / r(3, 1))
    elif order == "zxz":
        t1 = jnp.arctan(-r(1, 3) / r(2, 3))
        t2 = jnp.arctan(-r(2, 3) / (r(3, 3) * jnp.cos(t1)))
        t3 = jnp.arctan(r(3, 1) / r(3, 2))
    else:
        raise ValueError(f"invalid order {order!r}")

    return jnp.stack([t1, t2, t3], axis=-1) * RAD2DEG


@jax.jit
def landmarks_to_pose(landmarks: jnp.ndarray, img_w: float, img_h: float):
    """Batched (T, 478, 3) landmarks -> (angle (T,3) deg, centroid (T,3)).

    Fuses centroid + calc_R + matrix_to_angles for a whole video's frames —
    the reference runs these per frame inside FaceAdapter.__init__
    (adapter.py:26-33): centroid = mean landmark, face centered, then
    angle = matrix_to_angles(calc_R(face)). Centering is translation-only
    and calc_R depends only on landmark differences, so R is unaffected.
    """
    R = calc_R(landmarks, img_w, img_h)
    ang = matrix_to_angles(R, "xyz")
    cen = centroid(landmarks)
    return ang, cen
