"""timebase: the canonical arithmetic must equal what the builders and
extractors actually compute (cross-checked against their inline code)."""

import math

from multimodalreactiongeneration_tpu.ops.dsp import FbankParams
from multimodalreactiongeneration_tpu.utils import timebase as tb


def test_audio_offset_matches_builders():
    # databuild.py:203 and databuild_nx.py:401 use the same expression
    nfft, shift, delta = 400, 160, 2
    assert tb.audio_offset(nfft, shift, delta) == (shift * delta) + (nfft - shift)
    assert tb.audio_offset(nfft, shift, delta) == 560


def test_motion_offset():
    assert tb.motion_offset(400, 160, 2, 25.0, 16000) == math.ceil(
        560 * 25 / 16000
    )


def test_frame_counts_match_fbank_params():
    p = FbankParams()
    for samples in (16000, 15920, 1840):
        assert tb.num_fbank_frames(samples, p.n_fft, p.hop) == p.num_frames(
            samples
        )
        assert tb.num_feature_frames(
            samples, p.n_fft, p.hop, p.delta_order
        ) == p.num_output_frames(samples)


def test_window_arithmetic_consistency():
    """A window of F motion frames at pred_shift=2 needs exactly
    F*ratio feature frames of audio — the invariant the dataset asserts."""
    fps, sr, nfft, shift, delta, pred_shift = 25.0, 16000, 400, 160, 2, 2
    ratio = int((sr / shift) / (fps / pred_shift))
    start_f, end_f = 40, 140  # video frames
    a_start = tb.frame_to_sample(start_f, sr, fps) - tb.audio_offset(
        nfft, shift, delta
    )
    a_end = tb.frame_to_sample(end_f, sr, fps)
    feat = tb.num_feature_frames(a_end - a_start, nfft, shift, delta)
    motion_frames = (end_f - start_f) // pred_shift
    assert feat == motion_frames * ratio


def test_phase_and_margin():
    assert tb.motion_phase_start(10, 2) == 11
    assert tb.delta_margin(2, 2) == 4
