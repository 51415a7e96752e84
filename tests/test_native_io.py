"""Native C++ IO library (ctypes binding) vs the Python reader."""

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.utils import native_io, wavio


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    path = tmp_path_factory.mktemp("nat") / "x.wav"
    rng = np.random.default_rng(0)
    sig = (0.3 * rng.standard_normal(16000 * 3)).astype(np.float32)
    wavio.write_wav(str(path), sig[None], 16000)
    return str(path), sig


def test_slice_matches_python(wav):
    path, sig = wav
    got = native_io.read_slice(path, 1000, 8000)
    ref, _ = wavio.read_wav(path, 1000, 8000)
    np.testing.assert_allclose(got, ref[0], atol=1e-7)


def test_eof_zero_pad(wav):
    path, sig = wav
    got = native_io.read_slice(path, len(sig) - 50, 200)
    assert got.shape == (200,)
    assert (got[50:] == 0).all()


def test_batch_read(wav):
    path, _ = wav
    out = native_io.read_batch([path, path, path], [0, 100, 200], 4000)
    assert out.shape == (3, 4000)
    ref, _ = wavio.read_wav(path, 100, 4000)
    np.testing.assert_allclose(out[1], ref[0], atol=1e-7)


def test_frame_energy_matches_vad(wav):
    path, sig = wav
    from multimodalreactiongeneration_tpu.data.segmentation import (
        compute_log_power,
    )

    e = native_io.frame_energy(sig[:16000])
    np.testing.assert_allclose(
        np.log(e), compute_log_power(sig[:16000]), atol=1e-3
    )


def test_missing_file_raises():
    if not native_io.available():
        pytest.skip("native lib unavailable")
    with pytest.raises(OSError):
        native_io.read_slice("/nonexistent/file.wav", 0, 100)


def test_vad_log_power_uses_native_kernel_when_available(monkeypatch, wav):
    """compute_log_power (the databuild VAD front half) must consume the
    native kernel when the .so is present — it was previously built,
    tested, and unwired (no production caller)."""
    from multimodalreactiongeneration_tpu.data import segmentation

    _, sig = wav
    calls = []

    def spy(wave, n_fft, n_shift):
        calls.append((len(wave), n_fft, n_shift))
        return np.full(7, 2.0, np.float32)

    monkeypatch.setattr(
        "multimodalreactiongeneration_tpu.utils.native_io.frame_energy_native",
        spy,
    )
    out = segmentation.compute_log_power(sig[:16000])
    assert calls == [(16000, 400, 160)]
    np.testing.assert_allclose(out, np.log(2.0), atol=1e-6)

    # and the numpy fallback engages when the native kernel is absent
    monkeypatch.setattr(
        "multimodalreactiongeneration_tpu.utils.native_io.frame_energy_native",
        lambda *a: None,
    )
    np.testing.assert_allclose(
        segmentation.compute_log_power(sig[:16000]),
        segmentation._log_power_numpy(sig[:16000]),
        atol=0,
    )
