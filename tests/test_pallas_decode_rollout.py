"""Fused Pallas decode-rollout kernel vs the hoisted XLA scan
(interpret mode on CPU).

The kernel (ops/pallas_decode_rollout.py) runs the whole post-priming
AR rollout as one pallas_call with VMEM-resident ring caches. Its
contract: identical math to generate_metaformer's hoisted lax.scan —
folded attends, LSTM main chain, AR feedback — so with f32 caches and
f32 matmul panels the two paths must agree to float-reassociation
tolerance, including across ring-buffer wrap and teacher-forced blends.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from multimodalreactiongeneration_tpu.infer.generate import (
    generate_metaformer,
    sampling_mask_for,
)
from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from tests.test_generate import _full_batch
from tests.test_streaming_models import MF_CFG


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # CPU test environment: run the kernel in interpreter mode
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    monkeypatch.setenv("MRGEN_FUSED_DECODE", "1")


def _paths(cfg, batch, mask, seed):
    model = Metaformer(cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), *batch[:6])
    with jax.default_matmul_precision("highest"):
        scan = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            fused_rollout=False,
        )
        fused = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            fused_rollout=True,
        )
    return np.asarray(scan), np.asarray(fused)


def test_fused_rollout_matches_scan_full_mask():
    batch = _full_batch(jax.random.PRNGKey(50))
    mask = sampling_mask_for(6, "full")
    scan, fused = _paths(MF_CFG, batch, mask, 51)
    assert fused.shape == scan.shape == (2, 6, 18)
    np.testing.assert_allclose(fused, scan, atol=2e-5)


def test_fused_rollout_matches_scan_with_ring_wrap():
    # audio budget 0.32 s x 100 Hz = 32 tokens (primed 16 + 48 appended
    # -> wraps), motion budget 0.32 x 12.5 = 4 (primed 2 + 6 -> wraps);
    # both rings overwrite mid-rollout and the visibility frontier must
    # match the XLA raw_cache_extend semantics exactly
    cfg = dict(MF_CFG, max_context_len=0.32)
    batch = _full_batch(jax.random.PRNGKey(52))
    mask = sampling_mask_for(6, "full")
    scan, fused = _paths(cfg, batch, mask, 53)
    np.testing.assert_allclose(fused, scan, atol=2e-5)


def test_fused_rollout_matches_scan_teacher_and_scheduled():
    batch = _full_batch(jax.random.PRNGKey(54))
    for mask in (
        sampling_mask_for(6, "teacher"),
        sampling_mask_for(6, "scheduled", key=jax.random.PRNGKey(5),
                          rate=0.5),
    ):
        scan, fused = _paths(MF_CFG, batch, mask, 55)
        np.testing.assert_allclose(fused, scan, atol=2e-5)


def test_fused_rollout_gate():
    # unsupported config: forcing raises, auto falls back to the scan
    cfg = dict(MF_CFG, interlayer_residual=True)
    model = Metaformer(cfg=cfg)
    batch = _full_batch(jax.random.PRNGKey(56))
    params = jax.jit(model.init)(jax.random.PRNGKey(57), *batch[:6])
    mask = sampling_mask_for(6, "full")
    with pytest.raises(ValueError, match="fused_rollout"):
        generate_metaformer(model, params, batch, mask,
                            fused_rollout=True)
    pred = generate_metaformer(model, params, batch, mask)  # auto
    assert np.isfinite(np.asarray(pred)).all()

    # forcing fused on a non-hoistable layout must raise, not silently
    # run the scan (the fused kernel needs the hoisted shared rings)
    model2 = Metaformer(cfg=MF_CFG)
    params2 = jax.jit(model2.init)(jax.random.PRNGKey(58), *batch[:6])
    with pytest.raises(ValueError, match="fused_rollout"):
        generate_metaformer(model2, params2, batch, mask,
                            kv_layout="per_block", fused_rollout=True)


def test_fused_auto_gate_respects_vmem_budget(monkeypatch):
    # empirical v5e anchors: b16/b32 bf16 compile, b64 bf16 and b16
    # all-f32 exceed 128 MB VMEM (register spills) — auto must run
    # over-budget batches CHUNKED (largest fitting slice) and fall back
    # to the scan only when no slice fits, never surface a Mosaic
    # compile error
    from multimodalreactiongeneration_tpu.infer import generate as G
    import bench

    monkeypatch.setenv("MRGEN_FUSED_DECODE", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = bench.BENCH_CFG
    assert G._resolve_fused("auto", cfg, jnp.bfloat16, 8, 16, 96) == 16
    assert G._resolve_fused("auto", cfg, jnp.bfloat16, 8, 32, 96) == 32
    # batch 64 exceeds the budget whole but fits as 2x32 slices
    assert G._resolve_fused("auto", cfg, jnp.bfloat16, 8, 64, 96) == 32
    assert G._resolve_fused("auto", cfg, jnp.bfloat16, 8, 128, 96) == 32
    assert not G._resolve_fused("auto", cfg, jnp.float32, 8, 16, 96)
    # misaligned priming length: the kernel's contiguous ring write
    # needs len_a0 % ratio == 0 — unaligned stays on the scan
    assert not G._resolve_fused("auto", cfg, jnp.bfloat16, 8, 16, 100)
    # MRGEN_FUSED_MM=f32 doubles the panel bytes: batch 32 whole then
    # lands in the measured compile-fail band and must chunk to 16
    monkeypatch.setenv("MRGEN_FUSED_MM", "f32")
    assert G._resolve_fused("auto", cfg, jnp.bfloat16, 8, 32, 96) == 16
    assert G._resolve_fused("auto", cfg, jnp.bfloat16, 8, 16, 96) == 16


def test_fused_rollout_chunked_matches_single(monkeypatch):
    # the VMEM gate splits over-budget batches into independent
    # batch slices (dialogs don't interact) — slice size must not
    # change the result
    from multimodalreactiongeneration_tpu.infer import generate as G

    batch = _full_batch(jax.random.PRNGKey(62))
    mask = sampling_mask_for(6, "full")
    model = Metaformer(cfg=MF_CFG)
    params = jax.jit(model.init)(jax.random.PRNGKey(63), *batch[:6])
    with jax.default_matmul_precision("highest"):
        single = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            fused_rollout=True,
        )
        monkeypatch.setattr(G, "_resolve_fused", lambda *a, **k: 1)
        chunked = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            fused_rollout=True,
        )
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(single), atol=2e-5
    )


def test_fused_rollout_sharded_matches_unsharded():
    # GSPMD can't auto-partition a Mosaic custom call; shard_any_dim
    # (ops/partitioning.py) partitions the rollout over the batch with
    # replicated weights — sharded dialogs on the 8-device mesh must
    # reproduce the unsharded fused result exactly (f32 caches)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    batch = _full_batch(jax.random.PRNGKey(60), B=8)
    mask = sampling_mask_for(6, "full")
    model = Metaformer(cfg=MF_CFG)
    params = jax.jit(model.init)(jax.random.PRNGKey(61), *batch[:6])
    decode = jax.jit(lambda p, b: generate_metaformer(
        model, p, b, mask, cache_dtype=jnp.float32, kv_layout="shared",
        fused_rollout=True,
    ))
    with jax.default_matmul_precision("highest"):
        ref = decode(params, batch)
        bsh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        out = decode(
            jax.device_put(params, rep),
            tuple(jax.device_put(x, bsh) for x in batch),
        )
    assert len(out.sharding.device_set) == 8  # stayed partitioned
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_fused_rollout_bf16_caches_track_f32():
    # the production configuration (bf16 caches + bf16 matmul panels)
    # must stay near the f32 scan path — same drift budget as the bf16
    # KV default (tests/test_generate.py)
    batch = _full_batch(jax.random.PRNGKey(58))
    mask = sampling_mask_for(6, "full")
    model = Metaformer(cfg=MF_CFG)
    params = jax.jit(model.init)(jax.random.PRNGKey(59), *batch[:6])
    with jax.default_matmul_precision("highest"):
        scan = generate_metaformer(
            model, params, batch, mask,
            cache_dtype=jnp.float32, kv_layout="shared",
            fused_rollout=False,
        )
    fused = generate_metaformer(
        model, params, batch, mask,
        cache_dtype=jnp.bfloat16, kv_layout="shared", fused_rollout=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(scan), atol=5e-2
    )
