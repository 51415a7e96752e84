"""Generation evaluation & visualization (reference visualize_metaformer).

Behavior-matched to /root/reference/mr_gen/utils/visualize/
visualize_metaformer.py:
  * batched generation with wall-clock timing appended to ``speed.log``
    per sample (:115-127) — the reference's only latency metric
  * de-standardization via the npz stats (:129-132)
  * predicted-vs-ground-truth rendering (:239-267): head pose point +
    heading vector per frame (head_pose_plotter, visualizer.py:84-123),
    drawn with PIL instead of cv2 (cv2/ffmpeg absent in this image);
    frames export as PNG sequences + the wav is copied alongside
  * 5-second pitch ("nod") plots + amplitude-ratio printout (:300-318)
    via matplotlib

Everything model-side runs as the jitted scan engine; rendering is host.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from multimodalreactiongeneration_tpu.infer.generate import (
    generate_lws,
    generate_metaformer,
    sampling_mask_for,
)
from multimodalreactiongeneration_tpu.ops.rotations import angles_to_matrix


def destandardize(
    motion: np.ndarray, stats: Dict[str, np.ndarray]
) -> Tuple[np.ndarray, np.ndarray]:
    """(T, >=6) standardized [angle, centroid] -> raw degrees / coords."""
    angle = motion[..., :3] * stats["angle_std"] + stats["angle_mean"]
    centroid = motion[..., 3:6] * stats["centroid_std"] + stats["centroid_mean"]
    return angle, centroid


def generation_speed_log(
    model,
    params,
    model_type: str,
    batches: List[Tuple[np.ndarray, ...]],
    speed_log_path: str = "speed.log",
) -> List[np.ndarray]:
    """Full-generation rollouts, per-batch wall clock appended to speed.log
    (reference :115-127, reset semantics :369-371)."""
    if os.path.exists(speed_log_path):
        os.remove(speed_log_path)
    gen = generate_lws if model_type == "lstm_with_sampling" else generate_metaformer
    step = jax.jit(
        lambda p, d: gen(model, p, d, sampling_mask_for(d[1].shape[1], "full"))
    )
    preds = []
    for data in batches:
        t0 = time.perf_counter()
        pred = step(params, data)
        jax.block_until_ready(pred)
        dt = time.perf_counter() - t0
        frames = int(pred.shape[0] * pred.shape[1])
        with open(speed_log_path, "a", encoding="utf-8") as f:
            f.write(f"{dt:.6f} sec / {frames} frames "
                    f"({frames / dt:.1f} frames/s)\n")
        preds.append(np.asarray(pred))
    return preds


def head_pose_plotter(
    angle_deg: np.ndarray,
    centroid: np.ndarray,
    size: Tuple[int, int] = (480, 480),
    color=(60, 160, 255),
):
    """Render one head pose: centroid dot + heading vector (PIL Image).

    Reference visualizer.py:84-123 draws the face point cloud + heading
    with cv2; the heading is the rotated forward (-z) axis projected to
    the image plane.
    """
    from PIL import Image, ImageDraw

    img = Image.new("RGB", size, (20, 20, 24))
    draw = ImageDraw.Draw(img)
    w, h = size
    cx, cy = float(centroid[0]) * w, float(centroid[1]) * h
    R = np.asarray(angles_to_matrix(np.asarray(angle_deg, np.float32), "xyz"))
    heading = R.T @ np.array([0.0, 0.0, -1.0])
    hx, hy = cx + heading[0] * 80, cy + heading[1] * 80
    r = 8
    draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=color)
    draw.line([cx, cy, hx, hy], fill=(255, 255, 255), width=3)
    return img


def render_comparison(
    pred_motion: np.ndarray,
    true_motion: np.ndarray,
    stats: Dict[str, np.ndarray],
    output_dir: str,
    wav_path: Optional[str] = None,
    max_frames: Optional[int] = None,
) -> int:
    """Side-by-side predicted/GT frame sequence -> output_dir/frame_%05d.png."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    p_ang, p_cen = destandardize(pred_motion, stats)
    t_ang, t_cen = destandardize(true_motion, stats)
    n = len(p_ang) if max_frames is None else min(max_frames, len(p_ang))
    for t in range(n):
        left = head_pose_plotter(p_ang[t], p_cen[t], color=(60, 160, 255))
        right = head_pose_plotter(t_ang[t], t_cen[t], color=(90, 220, 120))
        frame = Image.new("RGB", (960, 480))
        frame.paste(left, (0, 0))
        frame.paste(right, (480, 0))
        frame.save(os.path.join(output_dir, f"frame_{t:05d}.png"))
    if wav_path and os.path.exists(wav_path):
        shutil.copy(wav_path, os.path.join(output_dir, "audio.wav"))
    return n


def nod_pitch_plot(
    pred_motion: np.ndarray,
    true_motion: np.ndarray,
    stats: Dict[str, np.ndarray],
    output_path: str,
    pred_fps: float = 12.5,
    window_seconds: float = 5.0,
) -> float:
    """Pitch-over-time strips per 5 s window + nod-amplitude ratio
    (reference :300-318). Returns pred/GT pitch-range ratio."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p_ang, _ = destandardize(pred_motion, stats)
    t_ang, _ = destandardize(true_motion, stats)
    pitch_p, pitch_t = p_ang[:, 0], t_ang[:, 0]
    times = np.arange(len(pitch_p)) / pred_fps

    win = int(window_seconds * pred_fps)
    n_win = max(len(pitch_p) // win, 1)
    fig, axes = plt.subplots(n_win, 1, figsize=(10, 2.2 * n_win), squeeze=False)
    for i in range(n_win):
        sl = slice(i * win, (i + 1) * win)
        ax = axes[i][0]
        ax.plot(times[sl], pitch_t[sl], label="ground truth", color="tab:green")
        ax.plot(times[sl], pitch_p[sl], label="prediction", color="tab:blue")
        ax.set_ylabel("pitch [deg]")
        if i == 0:
            ax.legend(loc="upper right")
    axes[-1][0].set_xlabel("time [s]")
    fig.tight_layout()
    fig.savefig(output_path)
    plt.close(fig)

    range_p = float(np.ptp(pitch_p)) if len(pitch_p) else 0.0
    range_t = float(np.ptp(pitch_t)) if len(pitch_t) else 1.0
    return range_p / max(range_t, 1e-9)
