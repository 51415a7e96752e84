"""Synthetic dyadic corpus generator for end-to-end pipeline tests.

Creates the directory layout the reference's databuild walks
(databuild_nx.py:159-191): session dirs containing host/comp wavs and
host/comp motion .npz files with angle/centroid/means/stds/section keys
(the extract_angle_cent output format, data/extract_angle_cent.py:131-161).

Speech pattern: alternating host/comp noise bursts (log frame power well
above the -4 VAD threshold), silence elsewhere, so turn segmentation finds
clean alternating turns.
"""

from __future__ import annotations

import os

import numpy as np

from multimodalreactiongeneration_tpu.utils.wavio import write_wav

SR = 16000
FPS = 25


def _burst_wave(seconds: float, bursts, rng) -> np.ndarray:
    wave = np.zeros(int(seconds * SR), np.float32)
    for start, end in bursts:
        s, e = int(start * SR), int(end * SR)
        wave[s:e] = 0.3 * rng.standard_normal(e - s).astype(np.float32)
    return wave


def _motion_npz(path: str, num_frames: int, rng, start: int = 0):
    steps = rng.normal(0, 0.8, size=(num_frames, 6)).astype(np.float64)
    traj = np.cumsum(steps, axis=0) * 0.05
    angle_raw = traj[:, :3] * 5.0
    cent_raw = 0.5 + traj[:, 3:] * 0.01
    angle_mean, angle_std = angle_raw.mean(0), angle_raw.std(0) + 1e-6
    cent_mean, cent_std = cent_raw.mean(0), cent_raw.std(0) + 1e-6
    np.savez(
        path,
        angle=(angle_raw - angle_mean) / angle_std,
        centroid=(cent_raw - cent_mean) / cent_std,
        angle_mean=angle_mean,
        angle_std=angle_std,
        centroid_mean=cent_mean,
        centroid_std=cent_std,
        section=np.array([start, start + num_frames]),
    )


def make_synthetic_corpus(root: str, n_sessions: int = 1, seconds: float = 60.0):
    """Returns corpus root. Host talks on even slots, comp on odd ones."""
    rng = np.random.default_rng(42)
    for s in range(n_sessions):
        session = os.path.join(root, f"session{s:02d}", f"data{s:02d}")
        os.makedirs(session, exist_ok=True)

        host_bursts, comp_bursts = [], []
        t = 1.0
        who = 0
        while t + 9.0 < seconds:
            burst = (t, t + 7.0)
            (host_bursts if who == 0 else comp_bursts).append(burst)
            t += 10.0  # 3 s gap > pause_without_voice
            who ^= 1

        write_wav(
            os.path.join(session, "host.wav"),
            _burst_wave(seconds, host_bursts, rng)[None],
            SR,
        )
        write_wav(
            os.path.join(session, "comp.wav"),
            _burst_wave(seconds, comp_bursts, rng)[None],
            SR,
        )
        frames = int(seconds * FPS)
        _motion_npz(os.path.join(session, "host_000000.npz"), frames, rng)
        _motion_npz(os.path.join(session, "comp_000000.npz"), frames, rng)
    return root


def make_synthetic_corpus_v1(root: str, n_sessions: int = 1, seconds: float = 20.0):
    """v1 layout: <session>/<who>.wav + <session>/<who>/ dir of per-frame
    .head pickles (reference databuild.py:179-187, io.py:121-153)."""
    from multimodalreactiongeneration_tpu.data.head_io import (
        HeadFrame,
        write_head_frame,
    )

    rng = np.random.default_rng(7)
    frames = int(seconds * FPS)
    for s in range(n_sessions):
        session = os.path.join(root, f"session{s:02d}")
        os.makedirs(session, exist_ok=True)
        for who in ("host", "comp"):
            wave = 0.2 * rng.standard_normal(int(seconds * SR)).astype(np.float32)
            write_wav(os.path.join(session, f"{who}.wav"), wave[None], SR)
            head_dir = os.path.join(session, who)
            os.makedirs(head_dir, exist_ok=True)
            traj = np.cumsum(rng.normal(0, 0.5, (frames, 6)), axis=0) * 0.05
            ang_mean, ang_std = traj[:, :3].mean(0), traj[:, :3].std(0) + 1e-6
            cen_mean, cen_std = traj[:, 3:].mean(0), traj[:, 3:].std(0) + 1e-6
            for t in range(frames):
                frame = HeadFrame(
                    angle=traj[t, :3],
                    centroid=traj[t, 3:],
                    frame_no=t,
                    fps=float(FPS),
                    angle_mean=ang_mean,
                    angle_std=ang_std,
                    centroid_mean=cen_mean,
                    centroid_std=cen_std,
                )
                write_head_frame(
                    os.path.join(head_dir, f"{who}_{t:05d}.head"), t, frame
                )
    return root


DATA_CFG = dict(
    no_cache_build=False,
    clear_cache=False,
    fps=25,
    pred_fps=12.5,
    pred_shift=2,
    max_len=150,
    min_len=50,
    shift_len=150,
    leading_len=24,
    sample_rate=16000,
    nfft=400,
    shift=160,
    threshold=-4,
    minimum_utterance_length=1.0,
    pause_with_voice=1.0,
    pause_without_voice=2.0,
    mergin=1.0,
    use_partner_motion=True,
    use_partner_audio=True,
    use_self_motion=True,
    use_self_audio=False,
    target_shift=1,
    use_centroid=True,
    use_angle=True,
    delta_order=2,
)

MOTION_CFG = dict(
    delta_order=2, use_centroid=True, use_angle=True, train_by_std=True
)
AUDIO_CFG = dict(sample_rate=16000, nfft=400, shift=160, nmels=26, delta_order=2)
