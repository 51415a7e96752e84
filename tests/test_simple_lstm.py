"""SimpleLSTM: forward shape, loss semantics, gradient flow."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.models.simple_lstm import (
    SimpleLSTM,
    delta_loss_scaler,
    simple_lstm_loss,
    split_and_form,
)


pytestmark = pytest.mark.slow
CFG = dict(
    acostic_feat_size=81,
    motion_feat_size=18,
    motion_num_lstm=1,
    acostic_num_lstm=1,
    acostic_num_layers=2,
    motion_num_layers=2,
    acostic_lstm_size=16,
    motion_lstm_size=16,
    acostic_affine_size=32,
    motion_affine_size=32,
    acostic_output_size=32,
    motion_output_size=32,
    att_heads=4,
    att_num_layers=2,
    att_use_residual=True,
    att_use_layer_norm=True,
    dropout_rate=0.0,
    output_size=18,
    bidirectional=True,
    use_layer_norm=True,
    use_relu=True,
    use_mixing=True,
    use_residual=True,
    decoder_num_layers=2,
    decoder_num_lstm=1,
    decoder_lstm_size=16,
    decoder_affine_size=32,
    decoder_bottleneck_size=8,
    decoder_output_size=32,
    decoder_mapping_size=16,
    decoder_bidirectional=True,
    decoder_use_layer_norm=True,
    decoder_use_relu=True,
    decoder_use_mixing=True,
    decoder_use_residual=True,
    delta_loss_scale=2.0,
    all_static=True,
)
METRICS = dict(use_centroid=True, use_angle=True, delta_order=2)


def _batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    fbank = jax.random.normal(k1, (2, 120, 81))
    motion = jax.random.normal(k2, (2, 15, 18))
    target = jax.random.normal(k3, (2, 1, 18))
    return fbank, motion, target


def test_forward_shape_and_finite():
    model = SimpleLSTM(cfg=CFG)
    fbank, motion, _ = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), fbank, motion)
    y = model.apply(params, fbank, motion)
    assert y.shape == (2, 1, 18)
    assert np.isfinite(np.asarray(y)).all()


def test_split_and_form_recomputes_deltas():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 15, 18)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(2, 1, 18)), jnp.float32)
    out = split_and_form(x, y, delta_order=2, base_size=6)
    assert out.shape == (2, 1, 18)
    np.testing.assert_allclose(out[..., :6], y[..., :6])
    v = np.asarray(y[..., :6] - x[:, -1:, :6])
    np.testing.assert_allclose(np.asarray(out[..., 6:12]), v, atol=1e-6)
    a = v - np.asarray(x[:, -1:, 6:12])
    np.testing.assert_allclose(np.asarray(out[..., 12:]), a, atol=1e-6)


def test_delta_scaler():
    s = np.asarray(delta_loss_scaler(18, 2, 4.0))
    assert (s[:6] == 1.0).all() and np.allclose(s[6:], 2.0)


def test_loss_and_grads():
    model = SimpleLSTM(cfg=CFG)
    fbank, motion, target = _batch(jax.random.PRNGKey(2))
    params = model.init(jax.random.PRNGKey(3), fbank, motion)

    def loss_fn(p):
        y = model.apply(p, fbank, motion, deterministic=False)
        loss, _ = simple_lstm_loss(y, target, motion, CFG, METRICS)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradients actually reach the acoustic encoder through attention
    g = grads["params"]["acoustic_embed"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0
