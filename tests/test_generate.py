"""AR generation engine: scan rollout equivalence against full forward.

Teacher-forced stepwise decode must equal the full-sequence forward fed
the one-step-shifted self-motion input ([ms0, ms0..ms_{L-2}]) — for the
LSTM model exactly, for the metaformer because the KV caches reproduce
the rectangular causal mask's visibility frontier.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.infer.generate import (
    generate_lws,
    generate_metaformer,
    generation_loss,
    sampling_mask_for,
)
from multimodalreactiongeneration_tpu.models.lstm_with_sampling import LSTMwithSample
from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from multimodalreactiongeneration_tpu.train.losses import mse
from tests.test_streaming_models import LWS_CFG, MF_CFG



pytestmark = pytest.mark.slow
def _batch(key, T=6, lead=2, ratio=8, B=2):
    ks = jax.random.split(key, 7)
    return (
        jax.random.normal(ks[0], (B, T * ratio, 81)),
        jax.random.normal(ks[1], (B, T, 18)),
        jax.random.normal(ks[2], (B, T, 18)),
        jax.random.normal(ks[3], (B, lead * ratio, 81)),
        jax.random.normal(ks[4], (B, lead, 18)),
        jax.random.normal(ks[5], (B, T, 18)),  # placeholder sized like lead? no:
    )


def _full_batch(key, T=6, lead=2, ratio=8, B=2):
    ks = jax.random.split(key, 7)
    return (
        jax.random.normal(ks[0], (B, T * ratio, 81)),
        jax.random.normal(ks[1], (B, T, 18)),
        jax.random.normal(ks[2], (B, T, 18)),
        jax.random.normal(ks[3], (B, lead * ratio, 81)),
        jax.random.normal(ks[4], (B, lead, 18)),
        jax.random.normal(ks[5], (B, lead, 18)),
        jax.random.normal(ks[6], (B, T, 18)),  # target
    )


def _shifted_ms(ms):
    return jnp.concatenate([ms[:, :1], ms[:, :-1]], axis=1)


def test_lws_teacher_decode_matches_shifted_forward():
    model = LSTMwithSample(cfg=LWS_CFG)
    batch = _full_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *batch[:6])

    mask = sampling_mask_for(6, "teacher")
    pred = generate_lws(model, params, batch, mask)

    y_full, _ = model.apply(
        params, batch[0], batch[1], _shifted_ms(batch[2]), *batch[3:6]
    )
    y_full = y_full[:, 2:]  # slice off the lead
    np.testing.assert_allclose(np.asarray(pred), np.asarray(y_full), atol=1e-4)


def test_lws_full_generation_feeds_back():
    model = LSTMwithSample(cfg=LWS_CFG)
    batch = _full_batch(jax.random.PRNGKey(2))
    params = jax.jit(model.init)(jax.random.PRNGKey(3), *batch[:6])
    pred_full = generate_lws(model, params, batch, sampling_mask_for(6, "full"))
    pred_teach = generate_lws(model, params, batch, sampling_mask_for(6, "teacher"))
    assert pred_full.shape == (2, 6, 18)
    # step 0 identical (same prev), later steps diverge via feedback
    np.testing.assert_allclose(
        np.asarray(pred_full[:, 0]), np.asarray(pred_teach[:, 0]), atol=1e-5
    )
    assert not np.allclose(np.asarray(pred_full[:, -1]), np.asarray(pred_teach[:, -1]))


def test_lws_reference_effective_mode_differs():
    model = LSTMwithSample(cfg=LWS_CFG)
    batch = _full_batch(jax.random.PRNGKey(4))
    params = jax.jit(model.init)(jax.random.PRNGKey(5), *batch[:6])
    mask = sampling_mask_for(6, "full")
    a = generate_lws(model, params, batch, mask, carry_layerd_state=True)
    b = generate_lws(model, params, batch, mask, carry_layerd_state=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_metaformer_teacher_decode_matches_shifted_forward():
    cfg = dict(MF_CFG, max_context_len=100)  # budgets cover the whole clip
    model = Metaformer(cfg=cfg)
    batch = _full_batch(jax.random.PRNGKey(6))
    params = jax.jit(model.init)(jax.random.PRNGKey(7), *batch[:6])

    pred = generate_metaformer(
        model, params, batch, sampling_mask_for(6, "teacher"),
        # exactness claim needs f32 KV and the per_block layout (same ops
        # as the forward; the shared layout reassociates the projections
        # and is compared against per_block separately below)
        cache_dtype=jnp.float32, kv_layout="per_block",
    )
    y_full, _ = model.apply(
        params, batch[0], batch[1], _shifted_ms(batch[2]), *batch[3:6]
    )
    y_full = y_full[:, 2:]
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(y_full), atol=2e-4
    )
    # the bf16-KV inference DEFAULT must stay close to the f32 path:
    # K/V quantization perturbs attention inputs by ~2^-8 relative
    pred_bf16 = generate_metaformer(
        model, params, batch, sampling_mask_for(6, "teacher")
    )
    np.testing.assert_allclose(
        np.asarray(pred_bf16), np.asarray(y_full), atol=5e-2
    )
    # int8 KV (the serving-density option): per-token symmetric scales,
    # ~2^-7 relative K/V error — end-to-end drift bound slightly looser
    pred_int8 = generate_metaformer(
        model, params, batch, sampling_mask_for(6, "teacher"),
        cache_dtype=jnp.int8,
    )
    np.testing.assert_allclose(
        np.asarray(pred_int8), np.asarray(y_full), atol=1e-1
    )
    # and it must beat doing nothing: int8 stays close to bf16's output
    np.testing.assert_allclose(
        np.asarray(pred_int8), np.asarray(pred_bf16), atol=1e-1
    )


def test_metaformer_shared_kv_layout_matches_per_block():
    """The shared-KV decode layout (one raw ring buffer per other
    modality, per-block projections folded via attend_raw — the
    inference default) is an exact reassociation of the per-block
    layout: equal at highest matmul precision, drift-bounded at the
    default precision / bf16 caches."""
    cfg = dict(MF_CFG, max_context_len=100)
    model = Metaformer(cfg=cfg)
    batch = _full_batch(jax.random.PRNGKey(20))
    params = jax.jit(model.init)(jax.random.PRNGKey(21), *batch[:6])
    mask = sampling_mask_for(6, "full")

    with jax.default_matmul_precision("highest"):
        ring = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="per_block",
        )
        shared = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
        )
    np.testing.assert_allclose(
        np.asarray(shared), np.asarray(ring), atol=1e-5
    )

    # inference default (shared, bf16 raw cache) stays near the f32 path
    shared_bf16 = generate_metaformer(model, params, batch, mask)
    np.testing.assert_allclose(
        np.asarray(shared_bf16), np.asarray(ring), atol=5e-2
    )

    # int8 falls back to the per-block layout (scales live there)
    int8 = generate_metaformer(
        model, params, batch, mask, cache_dtype=jnp.int8
    )
    assert np.isfinite(np.asarray(int8)).all()


def test_metaformer_hoisted_encoders_match_in_loop():
    """The AR-decode encoder hoist (other-modality encoders run ONCE
    full-sequence before the scan instead of chunked inside it) is an
    exact reassociation: recurrent encoders carry state across chunks,
    so full-sequence == chunked. In-loop and hoisted rollouts must agree
    at highest matmul precision."""
    cfg = dict(MF_CFG, max_context_len=100)
    model = Metaformer(cfg=cfg)
    batch = _full_batch(jax.random.PRNGKey(30))
    params = jax.jit(model.init)(jax.random.PRNGKey(31), *batch[:6])
    mask = sampling_mask_for(6, "full")
    with jax.default_matmul_precision("highest"):
        in_loop = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            hoist_encoders=False,
        )
        hoisted = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            hoist_encoders=True,
        )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(in_loop), atol=1e-5
    )
    # the inference default (auto -> hoisted, shared bf16 caches) stays
    # near the f32 path
    auto = generate_metaformer(model, params, batch, mask)
    np.testing.assert_allclose(
        np.asarray(auto), np.asarray(in_loop), atol=5e-2
    )


def test_metaformer_hoisted_encoders_match_with_ring_wrap():
    """Hoist equivalence must survive ring-buffer truncation: with a
    context budget smaller than the rollout, slots wrap and overwrite —
    the hoisted path extends the rings from the precomputed stream and
    must reproduce the exact same visibility frontier."""
    # audio budget 0.25 s x 100 Hz = 25 tokens (< 64 in the clip),
    # motion budget 3 (< 8) — both rings wrap mid-rollout
    cfg = dict(MF_CFG, max_context_len=0.25)
    model = Metaformer(cfg=cfg)
    batch = _full_batch(jax.random.PRNGKey(32))
    params = jax.jit(model.init)(jax.random.PRNGKey(33), *batch[:6])
    mask = sampling_mask_for(6, "full")
    with jax.default_matmul_precision("highest"):
        in_loop = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            hoist_encoders=False,
        )
        hoisted = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            hoist_encoders=True,
        )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(in_loop), atol=1e-5
    )


def test_metaformer_hoist_rejects_mha_other_embeddings():
    """mha other-modality embeddings can't be hoisted (full-sequence
    causal visibility differs from the ring-buffer budget); auto must
    fall back to the in-loop path and forcing must raise."""
    cfg = dict(MF_CFG, emb_mixers=["mha", "mha", "lstm"],
               encoder_num_layer=1)
    model = Metaformer(cfg=cfg)
    batch = _full_batch(jax.random.PRNGKey(34))
    params = jax.jit(model.init)(jax.random.PRNGKey(35), *batch[:6])
    mask = sampling_mask_for(6, "full")
    with pytest.raises(ValueError, match="hoist_encoders"):
        generate_metaformer(
            model, params, batch, mask, hoist_encoders=True
        )
    pred = generate_metaformer(model, params, batch, mask)  # auto: in-loop
    assert np.isfinite(np.asarray(pred)).all()


def test_metaformer_full_generation_runs_jitted():
    model = Metaformer(cfg=MF_CFG)
    batch = _full_batch(jax.random.PRNGKey(8))
    params = jax.jit(model.init)(jax.random.PRNGKey(9), *batch[:6])
    gen = jax.jit(
        lambda p, b: generate_metaformer(
            model, p, b, sampling_mask_for(6, "full")
        )
    )
    pred = gen(params, batch)
    assert pred.shape == (2, 6, 18)
    assert np.isfinite(np.asarray(pred)).all()
    loss = generation_loss(pred, batch[-1], mse)
    assert np.isfinite(float(loss))


def test_metaformer_mha_emb_teacher_decode_matches_forward():
    """mha self-attention embeddings must carry decode caches: stepwise
    teacher-forced decode == full forward (the rectangular/causal
    visibility frontier reproduced by the emb + integrator ring buffers)."""
    cfg = dict(MF_CFG, max_context_len=100, emb_mixers=["mha", "mha", "mha"],
               encoder_num_layer=1)
    model = Metaformer(cfg=cfg)
    batch = _full_batch(jax.random.PRNGKey(11))
    params = jax.jit(model.init)(jax.random.PRNGKey(12), *batch[:6])

    pred = generate_metaformer(
        model, params, batch, sampling_mask_for(6, "teacher"),
        cache_dtype=jnp.float32, kv_layout="per_block",  # see above
    )
    y_full, _ = model.apply(
        params, batch[0], batch[1], _shifted_ms(batch[2]), *batch[3:6]
    )
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(y_full[:, 2:]), atol=5e-4
    )

    # the shared layout must agree with per_block for mha embeddings too
    # (emb ring buffers coexist with the shared integrator caches)
    with jax.default_matmul_precision("highest"):
        a = generate_metaformer(
            model, params, batch, sampling_mask_for(6, "teacher"),
            cache_dtype=jnp.float32, kv_layout="per_block",
        )
        b = generate_metaformer(
            model, params, batch, sampling_mask_for(6, "teacher"),
            cache_dtype=jnp.float32, kv_layout="shared",
        )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
