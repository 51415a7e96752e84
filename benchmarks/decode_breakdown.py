"""Decode-step component breakdown: where does a generation go?

Times three scans at the bench workload (batch 16 x 250 frames,
metaformer-256x5, bf16 caches), each with bench.time_decode (the
memoization-proof slope method):

  full       the production generate_metaformer rollout
  attention  ONLY the per-step shared-KV attention work: raw ring
             extends + 5 blocks x 2 folded cross-attentions
             (TorchMHA.attend_raw) over single-copy raw caches
  audio-enc  ONLY the per-step audio-encoder chain (8 frames through
             the 5-block recurrent stack, state carried)

This is the measurement behind the round-3 shared-KV redesign: with
the old per-block projected-K/V layout the attention component alone
cost 57.3 of the 92.4 ms/generation; the folded shared layout reads
~24 ms and the full decode ~38 ms (2026-08-18, v5e). The residual
(full - attention - audio-enc) is the main-modality chain: 5 emb LSTM
cells + cat/FFN/output head per step.

Usage: python benchmarks/decode_breakdown.py [--batch 16]
Prints one JSON line with component ms/generation.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=250)
    args = ap.parse_args()
    B, STEPS = args.batch, args.frames

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    import bench
    from multimodalreactiongeneration_tpu.infer.cache import (
        raw_cache_extend,
        raw_cache_init,
    )
    from multimodalreactiongeneration_tpu.infer.generate import (
        generate_metaformer,
        sampling_mask_for,
    )
    from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
    from multimodalreactiongeneration_tpu.nn.attention import TorchMHA
    from multimodalreactiongeneration_tpu.nn.mixers import RecurrentMixerLayerd

    H, HEADS, RATIO = 256, 4, 8
    model = Metaformer(cfg=bench.BENCH_CFG)
    batch = bench.make_batch(jax.random.PRNGKey(0), batch=B, frames=STEPS)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *batch[:6])
    mask = sampling_mask_for(STEPS, "full")

    # component scans decompose the XLA (non-fused) step; the fused
    # Pallas rollout (ops/pallas_decode_rollout.py) is timed as its own
    # row since it has no XLA components to decompose
    full = jax.jit(lambda p, b: generate_metaformer(
        model, p, b, mask, fused_rollout=False
    ))
    dt_full = bench.time_decode(full, params, batch)
    fused = jax.jit(lambda p, b: generate_metaformer(
        model, p, b, mask, fused_rollout="auto"
    ))
    dt_fused = bench.time_decode(fused, params, batch)

    # --- attention-only scan (same shapes as the production step) -----
    mha = TorchMHA(embed_dim=H, num_heads=HEADS, kdim=H, vdim=H)
    mha_params = jax.jit(mha.init)(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 1, H)), jnp.zeros((1, 8, H)), jnp.zeros((1, 8, H)),
    )

    def attn_scan(p, bt):
        a_chunks = jnp.pad(
            bt[0].reshape(B, STEPS, RATIO, 81),
            ((0, 0), (0, 0), (0, 0), (0, H - 81)),
        ).transpose(1, 0, 2, 3)
        m_chunks = jnp.pad(
            bt[1], ((0, 0), (0, 0), (0, H - 18))
        ).transpose(1, 0, 2)[:, :, None, :]
        ca = raw_cache_init(B, 1000, H, dtype=jnp.bfloat16)
        cm = raw_cache_init(B, 125, H, dtype=jnp.bfloat16)
        q0 = jnp.zeros((B, 1, H))

        def step(carry, xs):
            (ca, cm), q = carry
            a_t, m_t = xs
            ca2, a_full, mask_a = raw_cache_extend(ca, a_t)
            cm2, m_full, mask_m = raw_cache_extend(cm, m_t)
            y = q
            for _ in range(5):
                ya = mha.apply(p, y, a_full, mask_a,
                               method=TorchMHA.attend_raw)
                ym = mha.apply(p, y, m_full, mask_m,
                               method=TorchMHA.attend_raw)
                y = ya + ym
            return ((ca2, cm2), y), y[:, 0]

        (_, _), ys = jax.lax.scan(
            step, ((ca, cm), q0), (a_chunks, m_chunks), unroll=5
        )
        return ys.transpose(1, 0, 2)

    dt_attn = bench.time_decode(
        jax.jit(attn_scan), mha_params, (batch[0], batch[1])
    )

    # --- audio-encoder-only scan --------------------------------------
    enc = RecurrentMixerLayerd(
        hidden_size=H, kind="lstm", num_layerd=5, num_internal_layer=1,
        dropout=0.0, bidirectional=False, nonlinearity="none",
        residual=True, residual_layer_norm=True, bottleneck_size=64,
        use_bias=True,
    )
    feat = nn.Dense(H)
    fparams = jax.jit(feat.init)(jax.random.PRNGKey(3), jnp.zeros((1, 1, 81)))
    eparams = jax.jit(enc.init)(jax.random.PRNGKey(4), jnp.zeros((1, 8, H)))
    hx0 = [
        (jnp.zeros((1, B, H)), jnp.zeros((1, B, H))) for _ in range(5)
    ]

    def audio_scan(p, bt):
        fb = bt[0].reshape(B, STEPS, RATIO, 81).transpose(1, 0, 2, 3)

        def step(hx, fb_t):
            x = feat.apply(p[0], fb_t)
            y, hx2 = enc.apply(p[1], x, hx)
            return hx2, y[:, -1]

        _, ys = jax.lax.scan(step, hx0, fb, unroll=5)
        return ys.transpose(1, 0, 2)

    dt_audio = bench.time_decode(
        jax.jit(audio_scan), (fparams, eparams), (batch[0],)
    )

    print(json.dumps({
        "metric": "decode_breakdown_ms_per_generation",
        "batch": B,
        "full_ms": round(dt_full * 1e3, 1),
        "fused_rollout_ms": round(dt_fused * 1e3, 1),
        "attention_ms": round(dt_attn * 1e3, 1),
        "audio_encoder_ms": round(dt_audio * 1e3, 1),
        "main_chain_residual_ms": round(
            (dt_full - dt_attn - dt_audio) * 1e3, 1
        ),
        "frames_per_sec": round(B * STEPS / dt_full, 1),
        "fused_frames_per_sec": round(B * STEPS / dt_fused, 1),
    }))


if __name__ == "__main__":
    main()
