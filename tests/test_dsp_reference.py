"""Kaldi-style extractor vs a direct numpy transcription of the spec
(/root/reference/mr_gen/utils/tools/feature_extractor.py, dither off)."""

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.ops import dsp_reference as ref


def numpy_spec_impl(wave, p):
    fb, dct, lifter, _ = ref._constants(p)
    num_frames = (len(wave) - p.frame_size) // p.frame_shift + 1
    fbank = np.zeros((num_frames, p.num_mel_bins))
    log_power = np.zeros(num_frames)
    for f in range(num_frames):
        w = wave[f * p.frame_shift : f * p.frame_shift + p.frame_size].copy()
        w = w - np.mean(w)
        power = max(np.sum(w**2), 1e-10)
        log_power[f] = np.log(power)
        w2 = np.convolve(w, [1.0, -0.97], mode="full")[: len(w)]
        w2[0] = w[0] * 0.03
        w2 *= np.hamming(p.frame_size)
        spec = np.abs(np.fft.rfft(w2, n=p.fft_size)) ** 2
        fbank[f] = np.log(np.maximum(spec @ fb.T, 0.1))
    mfcc = fbank @ dct.T * lifter
    mfcc[:, 0] = log_power
    return fbank, log_power, mfcc


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    return (
        0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)


def test_fbank_matches_spec(wave):
    p = ref.KaldiParams(dither=0.0)
    fb, lp = ref.compute_fbank(wave, p)
    ref_fb, ref_lp, _ = numpy_spec_impl(wave.astype(np.float64), p)
    assert fb.shape == ref_fb.shape
    np.testing.assert_allclose(np.asarray(fb), ref_fb, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lp), ref_lp, atol=1e-3)


def test_mfcc_matches_spec(wave):
    p = ref.KaldiParams(dither=0.0)
    mfcc = ref.compute_mfcc(wave, p)
    _, _, ref_mfcc = numpy_spec_impl(wave.astype(np.float64), p)
    np.testing.assert_allclose(np.asarray(mfcc), ref_mfcc, atol=5e-3)


def test_spec_shape_and_dither(wave):
    p = ref.KaldiParams(dither=1e-6)
    import jax

    spec, lp = ref.compute_spec(wave, p, jax.random.PRNGKey(0))
    assert spec.shape[1] == p.fft_size // 2 + 1
    # dither is deterministic under a fixed key
    spec2, _ = ref.compute_spec(wave, p, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(spec2))
