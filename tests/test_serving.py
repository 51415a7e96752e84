"""ServingEngine: slot isolation, attach/detach lifecycle, vmap parity.

The correctness property that distinguishes the engine from naive
shared-batch decoding: every slot is an independent session — its
outputs depend only on its own attach time and inputs, never on what
other slots are doing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalreactiongeneration_tpu.infer.generate import (
    _init_metaformer_states,
)
from multimodalreactiongeneration_tpu.infer.serving import ServingEngine
from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from multimodalreactiongeneration_tpu.ops import dsp
from tests.test_streaming_models import MF_CFG

pytestmark = pytest.mark.slow

LEAD = 3


def _model_and_params():
    model = Metaformer(cfg=MF_CFG)
    init_in = (
        jnp.zeros((1, 8, 81)),
        jnp.zeros((1, 1, 18)),
        jnp.zeros((1, 1, 18)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_in)
    return model, params


def _lead(rng):
    return (
        rng.normal(size=(1, LEAD * 8, 81)).astype(np.float32),
        rng.normal(size=(1, LEAD, 18)).astype(np.float32),
        rng.normal(size=(1, LEAD, 18)).astype(np.float32),
    )


def _session_inputs(rng, steps, hop_samples=1280):
    audio = (0.1 * rng.standard_normal(
        (steps, hop_samples)
    )).astype(np.float32)
    mp = rng.normal(size=(steps, 1, 18)).astype(np.float32)
    return audio, mp


def _drive(engine, slot, audio, mp):
    """Step the engine with one active slot's inputs, zeros elsewhere."""
    outs = []
    for t in range(audio.shape[0]):
        a = np.zeros((engine.slots, engine.hop_samples), np.float32)
        m = np.zeros((engine.slots, 1, 18), np.float32)
        a[slot] = audio[t]
        m[slot] = mp[t]
        outs.append(engine.step(a, m)[slot])
    return np.stack(outs)


def test_single_slot_matches_unvmapped_reference():
    """Engine output == the same semantics executed with plain batch-1
    model.apply calls (validates the vmap lift + state threading).

    The reference path is jitted like the engine's: the shared-KV
    layout's folded attention einsums fuse differently eager vs
    compiled (~1e-3 fp drift regardless of matmul-precision setting),
    which would mask a real state-threading bug behind a loose
    tolerance — compiling both sides keeps the comparison at 1e-5."""
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    lead = _lead(rng)
    steps = 4
    audio, mp = _session_inputs(np.random.default_rng(1), steps)

    engine = ServingEngine(model, params, slots=2)
    slot = engine.attach(*lead)
    got = _drive(engine, slot, audio, mp)

    # plain batch-1 replication of the step semantics (same KV layout
    # as the engine — shared vs per_block round differently; their
    # equality is proven in test_generate.py)
    prime = jax.jit(
        lambda p, la, lmp, lms, st: model.apply(
            p, la, lmp, lms, states=st, use_masks=True
        )
    )
    step = jax.jit(
        lambda p, feat, mpf, prev, st: model.apply(
            p, feat, mpf, prev, states=st, use_masks=False
        )
    )
    st = _init_metaformer_states(MF_CFG, 1, kv_layout=engine.kv_layout)
    _, st = prime(params, *[jnp.asarray(x) for x in lead], st)
    prev = jnp.asarray(lead[2][:, -1:])
    fbp = engine._fbp
    tail = np.zeros(engine.context_samples, np.float32)
    want = []
    for t in range(steps):
        buf = np.concatenate([tail, audio[t]])
        tail = buf[-engine.context_samples:]
        feat = dsp.logmel_with_power(jnp.asarray(buf), fbp)[None]
        y, st = step(params, feat, jnp.asarray(mp[t])[None], prev, st)
        prev = y
        want.append(np.asarray(y)[0])
    want = np.stack(want)

    # 5e-5: residual vmap-vs-plain lowering noise (a threading bug
    # would show at 1e-2+, cf. the drift numbers in test_generate.py)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_slot_isolation():
    """A session's outputs must not depend on other slots' sessions."""
    model, params = _model_and_params()
    lead_a = _lead(np.random.default_rng(2))
    lead_b = _lead(np.random.default_rng(3))
    steps = 3
    audio_a, mp_a = _session_inputs(np.random.default_rng(4), steps)
    audio_b, mp_b = _session_inputs(np.random.default_rng(5), steps)

    # A alone
    engine = ServingEngine(model, params, slots=2)
    sa = engine.attach(*lead_a)
    alone = _drive(engine, sa, audio_a, mp_a)

    # A with B attached mid-stream and stepping different data
    engine2 = ServingEngine(model, params, slots=2)
    sa2 = engine2.attach(*lead_a)
    outs = []
    for t in range(steps):
        if t == 1:
            engine2.attach(*lead_b)  # B joins LATE: its ring position
            # trails A's — per-slot lengths must keep both aligned
        a = np.zeros((2, engine2.hop_samples), np.float32)
        m = np.zeros((2, 1, 18), np.float32)
        a[sa2] = audio_a[t]
        m[sa2] = mp_a[t]
        other = 1 - sa2
        a[other] = audio_b[t]
        m[other] = mp_b[t]
        outs.append(engine2.step(a, m)[sa2])
    together = np.stack(outs)

    np.testing.assert_allclose(together, alone, atol=1e-5)


def test_attach_detach_reuse():
    """Detaching frees the slot; a new session attached into the same
    slot behaves exactly like a session on a fresh engine."""
    model, params = _model_and_params()
    lead_a = _lead(np.random.default_rng(6))
    lead_b = _lead(np.random.default_rng(7))
    steps = 3
    audio, mp = _session_inputs(np.random.default_rng(8), steps)

    engine = ServingEngine(model, params, slots=1)
    slot = engine.attach(*lead_a)
    with pytest.raises(RuntimeError):
        engine.attach(*lead_b)  # pool full
    _drive(engine, slot, audio, mp)
    engine.detach(slot)
    with pytest.raises(ValueError):
        engine.detach(slot)
    assert not engine.active.any()

    slot_b = engine.attach(*lead_b)
    reused = _drive(engine, slot_b, audio, mp)

    fresh_engine = ServingEngine(model, params, slots=1)
    slot_f = fresh_engine.attach(*lead_b)
    fresh = _drive(fresh_engine, slot_f, audio, mp)

    np.testing.assert_allclose(reused, fresh, atol=1e-6)
    # detached rows come back zero
    engine.detach(slot_b)
    out = engine.step(
        np.zeros((1, engine.hop_samples), np.float32),
        np.zeros((1, 1, 18), np.float32),
    )
    assert (out == 0).all()


def test_step_shape_validation():
    model, params = _model_and_params()
    engine = ServingEngine(model, params, slots=2)
    with pytest.raises(ValueError):
        engine.step(
            np.zeros((2, 7), np.float32), np.zeros((2, 1, 18), np.float32)
        )
    with pytest.raises(ValueError):
        engine.step(
            np.zeros((2, engine.hop_samples), np.float32),
            np.zeros((2, 18), np.float32),
        )


def test_serving_over_mesh():
    """Slot pool sharded over an 8-device 'data' mesh == local engine."""
    from multimodalreactiongeneration_tpu.parallel.mesh import make_mesh

    model, params = _model_and_params()
    mesh = make_mesh(8)
    # f32 caches: this asserts SHARDING equivalence, and the bf16
    # attention path (bf16 q x bf16 cache since the MXU operand-dtype
    # fix) reassociates reductions differently per partition shape —
    # ~1e-5 ULP noise, same rationale as test_sharded_decode
    local = ServingEngine(model, params, slots=8,
                          cache_dtype=jnp.float32)
    sharded = ServingEngine(model, params, slots=8, mesh=mesh,
                            cache_dtype=jnp.float32)

    # the pool is genuinely distributed: slot-axis leaves span all devices
    leaf = jax.tree_util.tree_leaves(sharded._states)[0]
    assert len(leaf.sharding.device_set) == 8

    rng = np.random.default_rng(9)
    leads = [_lead(np.random.default_rng(10 + i)) for i in range(8)]
    for eng in (local, sharded):
        for ld in leads:
            eng.attach(*ld)
    for _ in range(2):
        audio = (0.1 * rng.standard_normal(
            (8, local.hop_samples)
        )).astype(np.float32)
        mp = rng.normal(size=(8, 1, 18)).astype(np.float32)
        np.testing.assert_allclose(
            sharded.step(audio, mp), local.step(audio, mp), atol=1e-5
        )

    with pytest.raises(ValueError):
        ServingEngine(model, params, slots=3, mesh=mesh)


def test_serving_mha_embeddings():
    """mha-embedding metaformer: the engine must pool the emb ring
    buffers too (not just the cross-modal ones)."""
    cfg = dict(MF_CFG, emb_mixers=["mha", "mha", "mha"], max_context_len=2)
    model = Metaformer(cfg=cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(5),
        jnp.zeros((1, 8, 81)), jnp.zeros((1, 1, 18)), jnp.zeros((1, 1, 18)),
    )
    engine = ServingEngine(model, params, slots=2)
    slot = engine.attach(*_lead(np.random.default_rng(12)))
    audio, mp = _session_inputs(np.random.default_rng(13), 3)
    out = _drive(engine, slot, audio, mp)
    assert out.shape == (3, 1, 18)
    assert np.isfinite(out).all()


def test_int8_kv_engine_tracks_bf16():
    """cache_dtype=int8 pools quantized ring buffers + per-slot scale
    leaves through the vmap lift; outputs must stay finite and close to
    the bf16 engine driven identically."""
    model, params = _model_and_params()
    rng = np.random.default_rng(5)
    lead = _lead(rng)
    steps = 4
    audio, mp = _session_inputs(np.random.default_rng(6), steps)

    eng16 = ServingEngine(model, params, slots=2)
    eng8 = ServingEngine(model, params, slots=2, cache_dtype=jnp.int8)
    assert eng16.attach(*lead) == eng8.attach(*lead)
    out16 = _drive(eng16, 0, audio, mp)
    out8 = _drive(eng8, 0, audio, mp)
    assert np.isfinite(out8).all()
    np.testing.assert_allclose(out8, out16, atol=1e-1)
