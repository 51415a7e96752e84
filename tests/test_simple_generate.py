"""SimpleLSTM sliding-window AR engine."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.infer.simple_generate import (
    audio_windows,
    sliding_window_generate,
)
from multimodalreactiongeneration_tpu.models.simple_lstm import SimpleLSTM
from tests.test_simple_lstm import CFG



pytestmark = pytest.mark.slow
def test_audio_windows_shapes_and_alignment():
    fbank = jnp.arange(40, dtype=jnp.float32)[:, None] * jnp.ones((1, 81))
    w = audio_windows(fbank, steps=4, frames_per_step=8, window_frames=16)
    assert w.shape == (4, 16, 81)
    # consecutive windows advance by frames_per_step
    np.testing.assert_allclose(
        np.asarray(w[1, :-8, 0]), np.asarray(w[0, 8:, 0])
    )


def test_sliding_window_generate_rolls_and_recomputes_deltas():
    model = SimpleLSTM(cfg=CFG)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (15, 18))
    fb = jax.random.normal(jax.random.PRNGKey(1), (6, 120, 81))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), fb[:1], ctx[None]
    )
    ys = jax.jit(
        lambda p, f, c: sliding_window_generate(model, p, f, c)
    )(params, fb, ctx)
    assert ys.shape == (6, 18)
    ys = np.asarray(ys)
    assert np.isfinite(ys).all()
    # delta channels are exact finite differences of the static channels
    # (split_and_form semantics against the rolling context)
    # step 1's delta1 = static_1 - static_0
    np.testing.assert_allclose(
        ys[1, 6:12], ys[1, :6] - ys[0, :6], atol=1e-5
    )
    np.testing.assert_allclose(
        ys[2, 12:18], ys[2, 6:12] - ys[1, 6:12], atol=1e-5
    )
