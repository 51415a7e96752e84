"""Streaming session: incremental features == offline features; step API."""

import jax
import numpy as np
import pytest

from multimodalreactiongeneration_tpu.infer.streaming import (
    MotionDeltaStream,
    StreamingSession,
)
from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from multimodalreactiongeneration_tpu.ops import dsp
from tests.test_streaming_models import MF_CFG



pytestmark = pytest.mark.slow
def test_incremental_fbank_matches_offline():
    """Chunked feature extraction with the session's left-context rule must
    reproduce the offline whole-signal features."""
    rng = np.random.default_rng(0)
    sr, hop, n_fft, ratio = 16000, 160, 400, 8
    wave = (0.3 * rng.standard_normal(4 * sr)).astype(np.float32)
    params = dsp.FbankParams()
    offline = np.asarray(dsp.logmel_with_power(wave, params))

    context = -(-(2 * hop + (n_fft - hop)) // hop) * hop  # hop-aligned
    warmup = context // hop
    hop_samples = ratio * hop
    tail = np.zeros(context, np.float32)
    chunks = []
    for i in range(0, len(wave) - hop_samples + 1, hop_samples):
        buf = np.concatenate([tail, wave[i : i + hop_samples]])
        tail = buf[-context:]
        chunks.append(np.asarray(dsp.logmel_with_power(buf, params)))
    streamed = np.concatenate(chunks, axis=0)

    # the streamed signal prepends `context` zeros -> `warmup` extra rows
    n = min(len(offline), len(streamed) - warmup)
    np.testing.assert_allclose(
        streamed[warmup : warmup + n], offline[:n], atol=2e-4
    )


def test_motion_delta_stream():
    rng = np.random.default_rng(1)
    poses = rng.normal(size=(10, 6)).astype(np.float32)
    ref = np.concatenate(
        [poses[2:], poses[1:-1] * 0, poses[2:] * 0], axis=-1
    )  # shape probe only
    stream = MotionDeltaStream(2)
    outs = [stream.push(p) for p in poses]
    assert outs[0] is None and outs[1] is None
    full = dsp.delta_stack(poses, 2)
    got = np.stack(outs[2:])
    np.testing.assert_allclose(got, np.asarray(full), atol=1e-6)


def test_streaming_session_steps():
    model = Metaformer(cfg=MF_CFG)
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(0)
    init_in = (
        jax.numpy.zeros((1, 8, 81)),
        jax.numpy.zeros((1, 1, 18)),
        jax.numpy.zeros((1, 1, 18)),
    )
    params = jax.jit(model.init)(key, *init_in)

    session = StreamingSession(model, params, batch=1)
    outs = []
    for _ in range(5):
        audio = (0.1 * rng.standard_normal((1, session.hop_samples))).astype(
            np.float32
        )
        mp = rng.normal(size=(1, 1, 18)).astype(np.float32)
        outs.append(session.step(audio, mp))
    outs = np.concatenate(outs, axis=1)
    assert outs.shape == (1, 5, 18)
    assert np.isfinite(outs).all()
    # KV caches actually grew (context budget accounting): the session
    # defaults to the shared raw-KV layout (one audio cache for all blocks)
    assert session.kv_layout == "shared"
    assert int(session.states["shared"][0]["length"]) == 5 * 8


def test_streaming_wrong_chunk_size_raises():
    model = Metaformer(cfg=MF_CFG)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((1, 8, 81)),
        jax.numpy.zeros((1, 1, 18)),
        jax.numpy.zeros((1, 1, 18)),
    )
    session = StreamingSession(model, params)
    import pytest

    with pytest.raises(ValueError):
        session.step(np.zeros((1, 100), np.float32), np.zeros((1, 1, 18), np.float32))
