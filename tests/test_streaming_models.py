"""LSTMwithSample and Metaformer: shapes, state threading, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalreactiongeneration_tpu.models.lstm_with_sampling import (
    LSTMwithSample,
    derived_sizes,
)
from multimodalreactiongeneration_tpu.models.lstmformer import (
    Metaformer,
    context_budgets,
)


pytestmark = pytest.mark.slow
LWS_CFG = dict(
    sampling_rate=16000,
    shift=160,
    pred_fps=12.5,
    use_centroid=True,
    use_angle=True,
    nmels=26,
    delta_order=2,
    sampler_hidden_size=32,
    sampler_num_layers=1,
    sampler_dropout_rate=0.0,
    hidden_size=32,
    bottleneck_size=8,
    num_layers=2,
    num_lstm=1,
    dropout_rate=0.0,
    use_layer_norm=True,
    use_mixing=True,
    use_residual=True,
    use_relu=True,
)

MF_CFG = dict(
    main_modal_idx=2,
    hidden_size=32,
    num_block=2,
    dropout=0.0,
    num_layerd=1,
    encoder_num_layer=2,
    num_internal_layer=1,
    residual=True,
    residual_layer_norm=True,
    bias=True,
    emb_mixers=["lstm", "lstm", "lstm"],
    bottleneck_size=8,
    nonlinearity="none",
    ffn_nonlinearity="relu",
    proj_size=0,
    num_heads=4,
    add_bias_kv=False,
    add_zero_attn=False,
    max_context_len=10,
    repeat_with_encoder=False,
    interlayer_residual=False,
    interlayer_residual_norm=True,
    sampling_rate=16000,
    shift=160,
    pred_fps=12.5,
    modalities=["audio", "motion", "motion"],
    use_centroid=True,
    use_angle=True,
    nmels=26,
    delta_order=2,
)


def _lws_batch(key, T=10, lead=4, ratio=8):
    ks = jax.random.split(key, 6)
    return (
        jax.random.normal(ks[0], (2, T * ratio, 81)),
        jax.random.normal(ks[1], (2, T, 18)),
        jax.random.normal(ks[2], (2, T, 18)),
        jax.random.normal(ks[3], (2, lead * ratio, 81)),
        jax.random.normal(ks[4], (2, lead, 18)),
        jax.random.normal(ks[5], (2, lead, 18)),
    )


def test_lws_sizes():
    s = derived_sizes(LWS_CFG)
    assert s["ratio"] == 8
    assert s["motion_input_size"] == 36
    assert s["acoustic_input_size"] == 81
    assert s["output_size"] == 18


def test_lws_forward_and_state():
    model = LSTMwithSample(cfg=LWS_CFG)
    batch = _lws_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *batch)
    y, state = model.apply(params, *batch)
    assert y.shape == (2, 14, 18)  # lead 4 + seq 10
    hx_sampler, hxs = state
    assert hx_sampler is not None and len(hxs) == 2

    # carried state changes the next chunk's output
    nxt = _lws_batch(jax.random.PRNGKey(2), T=6, lead=0)
    y1, _ = model.apply(params, *nxt[:3], None, None, None, state)
    y0, _ = model.apply(params, *nxt[:3])
    assert not np.allclose(np.asarray(y1), np.asarray(y0))


def test_lws_rate_mismatch_raises():
    model = LSTMwithSample(cfg=LWS_CFG)
    batch = list(_lws_batch(jax.random.PRNGKey(0)))
    batch[0] = batch[0][:, :-8]  # drop one motion-frame worth of audio
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(1), *batch)


def test_metaformer_forward_and_state():
    model = Metaformer(cfg=MF_CFG)
    T, lead, ratio = 8, 4, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    batch = (
        jax.random.normal(ks[0], (2, T * ratio, 81)),
        jax.random.normal(ks[1], (2, T, 18)),
        jax.random.normal(ks[2], (2, T, 18)),
        jax.random.normal(ks[3], (2, lead * ratio, 81)),
        jax.random.normal(ks[4], (2, lead, 18)),
        jax.random.normal(ks[5], (2, lead, 18)),
    )
    params = model.init(jax.random.PRNGKey(4), *batch)
    y, states = model.apply(params, *batch)
    assert y.shape == (2, 12, 18)
    assert np.isfinite(np.asarray(y)).all()
    assert len(states) == 2  # num_block
    assert len(states[0]["emb"]) == 3 and len(states[0]["crm"]) == 2
    assert len(states[1]["emb"]) == 1  # no re-encoding without repeat

    # causality: perturbing the last audio frame must not change y[0]
    a2 = batch[0].at[:, -1].add(100.0)
    y2, _ = model.apply(params, a2, *batch[1:])
    np.testing.assert_allclose(
        np.asarray(y[:, :1]), np.asarray(y2[:, :1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(y[:, -1]), np.asarray(y2[:, -1]))


def test_metaformer_mha_embeddings():
    cfg = dict(MF_CFG)
    cfg["emb_mixers"] = ["mha", "mha", "mha"]
    model = Metaformer(cfg=cfg)
    T, ratio = 4, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    batch = (
        jax.random.normal(ks[0], (1, T * ratio, 81)),
        jax.random.normal(ks[1], (1, T, 18)),
        jax.random.normal(ks[2], (1, T, 18)),
    )
    params = model.init(jax.random.PRNGKey(6), *batch)
    y, _ = model.apply(params, *batch)
    assert y.shape == (1, T, 18)
    assert np.isfinite(np.asarray(y)).all()


def test_context_budgets():
    assert context_budgets(MF_CFG) == [1000, 125]
