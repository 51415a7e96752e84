"""Real-binary integration tier (@pytest.mark.binaries).

Everywhere else the ffmpeg / mediapipe paths run against injected fakes
(those binaries are absent on the build box — the project Docker image
ships ffmpeg, docker/Dockerfile). These tests exercise the REAL binaries
end-to-end when present and skip cleanly otherwise:

    python -m pytest tests/ -m binaries        # inside the Docker image

Covered surfaces (reference parity targets):
  * FfmpegVideoWriter rawvideo pipe -> playable mp4 (reference cv2
    VideoWriter, mr_gen/utils/video.py)
  * patch_audio / cat_audio AAC mux (reference moviepy set_audio,
    video.py:158-164, visualize_metaformer.py:64-85)
  * trim_video frame-accurate trim (reference VideoReader.trime_time,
    video.py:271-277)
  * load_m4a decode + [::2] decimation (reference load_m4a,
    data_alignment.py:44-53)
  * mediapipe FaceMesh landmarker construction (reference
    landmark_estimation.py:22-57), when importable
"""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.utils import wavio

pytestmark = pytest.mark.binaries

HAVE_FFMPEG = shutil.which("ffmpeg") is not None
HAVE_FFPROBE = shutil.which("ffprobe") is not None
needs_ffmpeg = pytest.mark.skipif(
    not (HAVE_FFMPEG and HAVE_FFPROBE), reason="ffmpeg/ffprobe not on PATH"
)

SR = 16000


def _probe(path):
    out = subprocess.run(
        [
            "ffprobe", "-v", "error", "-print_format", "json",
            "-show_format", "-show_streams", path,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def _write_test_movie(path, frames=25, fps=25.0, w=64, h=48):
    from multimodalreactiongeneration_tpu.infer.video import FfmpegVideoWriter

    with FfmpegVideoWriter(path, fps=fps) as vw:
        for i in range(frames):
            frame = np.full((h, w, 3), (i * 9) % 255, np.uint8)
            vw.write(frame[None])


def _write_tone(path, seconds=1.0):
    t = np.arange(int(SR * seconds)) / SR
    sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    wavio.write_wav(path, sig[None], SR)
    return sig


@needs_ffmpeg
def test_ffmpeg_video_writer_produces_playable_mp4(tmp_path):
    path = str(tmp_path / "clip.mp4")
    _write_test_movie(path, frames=25, fps=25.0)
    info = _probe(path)
    v = next(s for s in info["streams"] if s["codec_type"] == "video")
    assert v["width"] == 64 and v["height"] == 48
    assert int(v["nb_frames"]) == 25


@needs_ffmpeg
def test_patch_audio_muxes_aac_track(tmp_path):
    from multimodalreactiongeneration_tpu.infer.video import patch_audio

    movie = str(tmp_path / "clip.mp4")
    wav = str(tmp_path / "tone.wav")
    out = str(tmp_path / "muxed.mp4")
    _write_test_movie(movie, frames=25, fps=25.0)
    _write_tone(wav, seconds=1.0)
    patch_audio(out, movie, wav)
    kinds = {s["codec_type"] for s in _probe(out)["streams"]}
    assert kinds == {"video", "audio"}
    a = next(s for s in _probe(out)["streams"] if s["codec_type"] == "audio")
    assert a["codec_name"] == "aac"


@needs_ffmpeg
def test_cat_audio_slices_and_muxes(tmp_path):
    from multimodalreactiongeneration_tpu.infer.video import cat_audio

    movie = str(tmp_path / "clip.mp4")
    wav = str(tmp_path / "dialog.wav")
    out = str(tmp_path / "muxed.mp4")
    _write_test_movie(movie, frames=25, fps=12.5)
    _write_tone(wav, seconds=4.0)
    cat_audio(movie, out, wav, start=10, stop=30, fps=12.5, stride=1)
    streams = _probe(out)["streams"]
    assert {s["codec_type"] for s in streams} == {"video", "audio"}
    # the sliced wav is written alongside with the reference's contract
    sliced = [p for p in os.listdir(tmp_path) if p.endswith(".wav")]
    assert len(sliced) >= 2  # original + slice


@needs_ffmpeg
def test_trim_video_is_frame_accurate(tmp_path):
    from multimodalreactiongeneration_tpu.infer.video import trim_video

    movie = str(tmp_path / "clip.mp4")
    out = str(tmp_path / "trimmed.mp4")
    _write_test_movie(movie, frames=50, fps=25.0)
    trim_video(movie, out, 0.4, 1.2)  # 20 frames @ 25 fps
    v = next(
        s for s in _probe(out)["streams"] if s["codec_type"] == "video"
    )
    assert int(v["nb_frames"]) == 20


@needs_ffmpeg
def test_load_m4a_decodes_and_decimates(tmp_path):
    from multimodalreactiongeneration_tpu.corpus.alignment import load_m4a

    # build a 32 kHz m4a the way a session recorder would
    wav32 = str(tmp_path / "mix32.wav")
    t = np.arange(32000) / 32000.0
    sig = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wavio.write_wav(wav32, sig[None], 32000)
    m4a = str(tmp_path / "mix.m4a")
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", wav32, m4a],
        check=True,
    )
    wave, rate = load_m4a(m4a)
    assert rate == SR  # 32k decoded then [::2] decimated
    assert 15000 <= len(wave) <= 17000  # ~1 s, aac may pad edges
    # the tone must survive the decode: dominant frequency ~220 Hz
    spec = np.abs(np.fft.rfft(wave[:SR]))
    assert abs(np.argmax(spec[10:]) + 10 - 220) <= 3


@needs_ffmpeg
def test_eval_render_pipeline_with_real_ffmpeg(tmp_path):
    """The eval CLI's render path end-to-end with the REAL encoder: frames
    -> mp4 -> audio mux (everywhere else driven by the fake encoder)."""
    from multimodalreactiongeneration_tpu.infer.video import (
        FfmpegVideoWriter,
        patch_audio,
    )
    from multimodalreactiongeneration_tpu.infer.visualize import (
        head_pose_plotter,
    )

    wav = str(tmp_path / "tone.wav")
    _write_tone(wav, seconds=2.0)
    movie = str(tmp_path / "pred.mp4")
    rng = np.random.default_rng(0)
    with FfmpegVideoWriter(movie, fps=12.5) as vw:
        for _ in range(25):
            pose = {
                "face": None,
                "angle": rng.normal(0, 5, 3).astype(np.float32),
                "centroid": (
                    np.array([0.5, 0.5, 0.0]) + rng.normal(0, 0.01, 3)
                ).astype(np.float32),
            }
            frame = np.zeros((96, 96, 3), np.uint8)
            frame = head_pose_plotter(frame, pose)
            vw.write(np.asarray(frame)[None])
    out = str(tmp_path / "final.mp4")
    patch_audio(out, movie, wav)
    info = _probe(out)
    assert {s["codec_type"] for s in info["streams"]} == {"video", "audio"}
    assert float(info["format"]["duration"]) == pytest.approx(2.0, abs=0.3)


def test_mediapipe_landmarker_constructs():
    mp = pytest.importorskip("mediapipe")
    del mp
    from multimodalreactiongeneration_tpu.corpus.landmarks import (
        mediapipe_landmarker,
    )

    landmarker = mediapipe_landmarker()
    frame = np.zeros((64, 64, 3), np.uint8)
    # empty frame -> no face; the adapter contract is None for a miss
    assert landmarker(frame) is None
