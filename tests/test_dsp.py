"""Golden tests for the fused fbank kernel.

The numpy reference below independently implements the torchaudio
MelSpectrogram spec (hann window, rFFT power, HTK mel triangles, norm=None,
center=False) plus the reference AudioPreprocessor's log-power loop and
delta stacking (/root/reference/mr_gen/utils/preprocess/audio.py). The JAX
kernel uses a completely different formulation (framed matmul DFT), so
agreement is strong evidence of correctness. The spectrogram path is also
cross-checked against torch.stft.
"""

import numpy as np
import pytest
import torch

from multimodalreactiongeneration_tpu.ops import dsp


def numpy_mel_reference(wave, sr=16000, n_fft=400, hop=160, n_mels=26):
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    num_frames = (len(wave) - n_fft) // hop + 1
    frames = np.stack(
        [wave[i * hop : i * hop + n_fft] for i in range(num_frames)]
    ).astype(np.float64)
    spec = np.abs(np.fft.rfft(frames * win, axis=-1)) ** 2
    fb = dsp.mel_filterbank(n_fft // 2 + 1, n_mels, sr).astype(np.float64)
    mel = spec @ fb
    log_mel = np.log(np.maximum(mel, 1e-6))
    energy = np.sum(frames**2, axis=-1, keepdims=True)
    log_power = np.log(np.maximum(energy, 1e-10))
    return np.concatenate([log_mel, log_power], axis=-1)


def numpy_delta(feat, order):
    if order == 0:
        return feat
    d1 = feat[1:] - feat[:-1]
    if order == 1:
        return np.concatenate([feat[1:], d1], axis=-1)
    d2 = d1[1:] - d1[:-1]
    return np.concatenate([feat[2:], d1[1:], d2], axis=-1)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t))
    return sig.astype(np.float32)


def test_logmel_matches_numpy_reference(wave):
    params = dsp.FbankParams()
    ours = np.asarray(dsp.logmel_with_power(wave, params))
    ref = numpy_delta(numpy_mel_reference(wave), 2)
    assert ours.shape == ref.shape == (params.num_output_frames(len(wave)), 81)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_power_spectrum_matches_torch_stft(wave):
    n_fft, hop = 400, 160
    win = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    tspec = torch.stft(
        torch.tensor(wave, dtype=torch.float64),
        n_fft,
        hop,
        window=win,
        center=False,
        return_complex=True,
    )
    tpow = (tspec.abs() ** 2).T.numpy()  # (T, freq)

    cos_b, sin_b, _ = dsp._bases(dsp.FbankParams())
    frames = np.asarray(dsp.frame_signal(wave, n_fft, hop))
    ours = (frames @ np.asarray(cos_b)) ** 2 + (frames @ np.asarray(sin_b)) ** 2
    assert ours.shape == tpow.shape
    np.testing.assert_allclose(ours, tpow, atol=1e-2, rtol=1e-3)


def test_delta_orders(wave):
    for order in (0, 1, 2):
        params = dsp.FbankParams(delta_order=order)
        out = np.asarray(dsp.logmel_with_power(wave[:8000], params))
        t_full = dsp.FbankParams().num_frames(8000)
        assert out.shape == (t_full - order, 27 * (order + 1))


def test_frame_log_power_matches_reference_loop(wave):
    # reference speech_segmentation.py:30-38 (unclamped frame energy log)
    n_fft, hop = 400, 160
    num = (len(wave) - n_fft) // hop + 1
    ref = np.array(
        [
            np.log(np.sum(wave[i * hop : i * hop + n_fft] ** 2))
            for i in range(num)
        ]
    )
    ours = np.asarray(dsp.frame_log_power(wave, n_fft, hop))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_batched_matches_single(wave):
    params = dsp.FbankParams()
    waves = np.stack([wave[:8000], wave[8000:16000]])
    batched = np.asarray(dsp.batched_logmel_with_power(waves, params))
    for b in range(2):
        single = np.asarray(dsp.logmel_with_power(waves[b], params))
        np.testing.assert_allclose(batched[b], single, atol=1e-4)
