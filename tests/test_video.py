"""Video writer / audio mux layer, driven with fake encoders (no ffmpeg
binary in CI; the default command path is asserted separately)."""

import os
import sys

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.infer import video as vid
from multimodalreactiongeneration_tpu.infer.video import (
    FfmpegVideoWriter,
    _default_encoder_cmd,
    cat_audio,
    patch_audio,
)
from multimodalreactiongeneration_tpu.utils import wavio


def fake_encoder_cmd(path, fps, width, height):
    """stdin -> file byte sink standing in for ffmpeg."""
    code = (
        "import sys; "
        f"open({path!r}, 'wb').write(sys.stdin.buffer.read())"
    )
    return [sys.executable, "-c", code]


@pytest.mark.slow
def test_writer_pipes_all_frames(tmp_path):
    out = tmp_path / "seg" / "clip.mp4"
    w, h, n = 32, 24, 5
    writer = FfmpegVideoWriter(str(out), fps=12.5, encoder_cmd=fake_encoder_cmd)
    with writer:
        writer.write(np.full((h, w, 3), 7, np.uint8))  # single frame
        writer.write([np.full((h, w, 3), i, np.uint8) for i in range(n - 1)])
    assert writer.frames_written == n
    assert out.stat().st_size == n * w * h * 3  # every rawvideo byte arrived


@pytest.mark.slow
def test_writer_rejects_bad_frames(tmp_path):
    writer = FfmpegVideoWriter(
        str(tmp_path / "x.mp4"), fps=25, encoder_cmd=fake_encoder_cmd
    )
    with pytest.raises(ValueError, match="uint8"):
        writer.write(np.zeros((8, 8, 3), np.float32))
    writer.write(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="size"):
        writer.write(np.zeros((16, 16, 3), np.uint8))
    writer.close()


def test_writer_requires_ffmpeg_without_injection(tmp_path, monkeypatch):
    monkeypatch.setattr(vid, "have_ffmpeg", lambda: False)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        FfmpegVideoWriter(str(tmp_path / "x.mp4"), fps=25)


def test_default_encoder_cmd_shape():
    cmd = _default_encoder_cmd("/o/out.mp4", 12.5, 960, 480)
    assert cmd[0] == "ffmpeg" and cmd[-1] == "/o/out.mp4"
    assert "rawvideo" in cmd and "960x480" in cmd and "rgb24" in cmd


def test_patch_audio_command(tmp_path):
    calls = []

    def runner(cmd, check):
        calls.append(cmd)

    patch_audio("out.mp4", "in.mp4", "a.wav", runner=runner)
    (cmd,) = calls
    assert cmd[cmd.index("-i") + 1] == "in.mp4"
    assert "a.wav" in cmd and cmd[-1] == "out.mp4"
    assert "copy" in cmd  # video stream-copied, not re-encoded


def test_cat_audio_slices_segment(tmp_path):
    """Sample window matches the reference's frame->sample conversion
    (visualize_metaformer.py:71-80): [sr*start/fps, sr*(stop+stride)/fps)."""
    sr, fps = 16000, 25.0
    wav = tmp_path / "pair.wav"
    wavio.write_wav(str(wav), np.zeros((1, sr * 4), np.float32), sr)
    out = tmp_path / "seg_patched.mp4"
    calls = []

    def runner(cmd, check):
        calls.append(cmd)

    wave_out = cat_audio(
        str(tmp_path / "seg.mp4"), str(out), str(wav),
        start=25, stop=50, fps=fps, stride=2, runner=runner,
    )
    sliced, got_sr = wavio.read_wav(wave_out)
    assert got_sr == sr
    expected = int(sr * (50 + 2) / fps) - int(sr * 25 / fps)
    assert sliced.shape[1] == expected
    assert len(calls) == 1 and str(out) == calls[0][-1]


@pytest.mark.slow
def test_render_segment_video_end_to_end(tmp_path):
    from multimodalreactiongeneration_tpu.infer.visualize import (
        render_segment_video,
    )

    sr = 16000
    wav = tmp_path / "pair.wav"
    wavio.write_wav(str(wav), np.zeros((1, sr * 6), np.float32), sr)
    rng = np.random.default_rng(0)
    stats = {
        "angle_mean": np.zeros(3), "angle_std": np.full(3, 10.0),
        "centroid_mean": np.full(3, 0.5), "centroid_std": np.full(3, 0.05),
    }
    mux_calls = []

    def runner(cmd, check):
        mux_calls.append(cmd)

    out = tmp_path / "seg" / "seg.mp4"
    n = render_segment_video(
        rng.normal(size=(12, 18)).astype(np.float32),
        rng.normal(size=(12, 18)).astype(np.float32),
        stats,
        str(out),
        wav_path=str(wav),
        seq={"start": 0, "end": 24, "stride": 2},
        data_fps=25.0,
        pred_fps=12.5,
        encoder_cmd=fake_encoder_cmd,
        runner=runner,
    )
    assert n == 12
    assert out.stat().st_size == 12 * 960 * 480 * 3
    assert len(mux_calls) == 1  # audio muxed once
    assert os.path.exists(str(out).rsplit(".", 1)[0] + "_patched.wav")
