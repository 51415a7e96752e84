"""Measurement probe: can a Pallas kernel with VMEM-resident ring caches
beat the XLA attention scan of the decode step?

The production decode's per-step attention work (10 folded attends over
2 shared raw ring buffers, decode_breakdown.py) measures ~24 ms per
250-step generation and sits near the HBM-streaming floor for the
8.2 MB audio cache (each attend's logits AND context matmuls re-stream
it). This probe runs the SAME attention math — 5 chained blocks x
(audio + motion) folded attends with the ring extends — as one Pallas
kernel whose caches live in VMEM scratch across the whole 250-step
grid, and times it against an identically-structured XLA lax.scan.

This is a throughput probe, not product code: no LN/FFN/main-chain, no
exactness vs the model (the fused rollout kernel, if the probe wins,
is the product follow-up). Prints one JSON line with both ms.
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS, B, H, K, SA, SM = 250, 16, 4, 256, 1000, 128
NB = 5          # metaformer blocks
LEN_A0, LEN_M0 = 96, 12  # primed ring lengths (lead 12 @ ratio 8)
BUD_M = 125     # motion budget (ring wraps at 125; slots 125-127 dead)
NEG = -1e30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench

    f32, bf16 = jnp.float32, jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(0), 10)
    wqa = jax.random.normal(keys[0], (NB, K, H * K), bf16) * 0.06
    wqm = jax.random.normal(keys[1], (NB, K, H * K), bf16) * 0.06
    woa = jax.random.normal(keys[2], (NB, H * K, K), bf16) * 0.06
    wom = jax.random.normal(keys[3], (NB, H * K, K), bf16) * 0.06
    ca0 = jax.random.normal(keys[4], (B, SA, K), bf16)
    cm0 = jax.random.normal(keys[5], (B, SM, K), bf16)
    enc_a = jax.random.normal(keys[6], (STEPS, B, 8, K), bf16)
    enc_m = jax.random.normal(keys[7], (STEPS, B, K), bf16)
    q0 = jax.random.normal(keys[8], (B, K), f32)

    scale = 1.0 / (64.0 ** 0.5)

    def attends(q, ca, cm, la, lm, wqa_l, wqm_l, woa_l, wom_l):
        """One block's audio+motion folded attends. q (B,K) f32."""
        outs = []
        for (wq, wo, c, s, filled, bud) in (
            (wqa_l, woa_l, ca, SA, la, SA),
            (wqm_l, wom_l, cm, SM, lm, BUD_M),
        ):
            qh = jnp.dot(
                q.astype(bf16), wq, preferred_element_type=f32
            ).reshape(B, H, K)
            logits = jax.lax.dot_general(
                qh.astype(bf16), c, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            ) * scale
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, H, s), 2)
            vis = jnp.minimum(filled, bud)
            logits = jnp.where(iota >= vis, NEG, logits)
            w = jax.nn.softmax(logits, axis=-1)
            ctx = jax.lax.dot_general(
                w.astype(bf16), c, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            outs.append(
                jnp.dot(
                    ctx.reshape(B, H * K).astype(bf16), wo,
                    preferred_element_type=f32,
                )
            )
        return outs[0] + outs[1]

    # ---- Pallas kernel: caches in VMEM scratch across the grid --------
    def kernel(ea_ref, em_ref, wqa_ref, wqm_ref, woa_ref, wom_ref,
               ca0_ref, cm0_ref, q0_ref, ys_ref, ca_scr, cm_scr, q_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            ca_scr[...] = ca0_ref[...]
            cm_scr[...] = cm0_ref[...]
            q_scr[...] = q0_ref[...]

        off_a = pl.multiple_of(jax.lax.rem(LEN_A0 + t * 8, SA), 8)
        ca_scr[:, pl.ds(off_a, 8), :] = ea_ref[0]
        off_m = jax.lax.rem(LEN_M0 + t, BUD_M)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (B, SM, K), 1)
        cm_scr[...] = jnp.where(
            iota_m == off_m, em_ref[0][:, None, :], cm_scr[...]
        )

        la = LEN_A0 + (t + 1) * 8
        lm = LEN_M0 + t + 1
        q = q_scr[...]
        ca = ca_scr[...]
        cm = cm_scr[...]
        for l in range(NB):
            q = attends(q, ca, cm, la, lm,
                        wqa_ref[l], wqm_ref[l], woa_ref[l], wom_ref[l])
        q_scr[...] = q
        ys_ref[0] = q

    full = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    fused = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((1, B, 8, K), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(wqa.shape), full(wqm.shape), full(woa.shape),
            full(wom.shape), full(ca0.shape), full(cm0.shape),
            full(q0.shape),
        ],
        out_specs=pl.BlockSpec((1, B, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, B, K), f32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        scratch_shapes=[
            pltpu.VMEM((B, SA, K), bf16),
            pltpu.VMEM((B, SM, K), bf16),
            pltpu.VMEM((B, K), f32),
        ],
    )

    def run_fused(params, batch):
        (q0,) = batch
        wqa, wqm, woa, wom, ca0, cm0 = params
        return fused(enc_a, enc_m, wqa, wqm, woa, wom, ca0, cm0, q0)

    # ---- XLA reference scan: same math, caches as scan carry ----------
    def run_scan(params, batch):
        wqa, wqm, woa, wom, ca0, cm0 = params
        (q0,) = batch

        def body(carry, xs):
            q, ca, cm, t = carry
            ea_t, em_t = xs
            off_a = (LEN_A0 + t * 8) % SA
            ca = jax.lax.dynamic_update_slice(ca, ea_t, (0, off_a, 0))
            off_m = (LEN_M0 + t) % BUD_M
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (B, SM, K), 1)
            cm = jnp.where(iota_m == off_m, em_t[:, None, :], cm)
            la = LEN_A0 + (t + 1) * 8
            lm = LEN_M0 + t + 1
            for l in range(NB):
                q = attends(q, ca, cm, la, lm,
                            wqa[l], wqm[l], woa[l], wom[l])
            return (q, ca, cm, t + 1), q

        (_, _, _, _), ys = jax.lax.scan(
            body, (q0, ca0, cm0, jnp.int32(0)), (enc_a, enc_m), unroll=5
        )
        return ys

    params = (wqa, wqm, woa, wom, ca0, cm0)
    scan_j = jax.jit(run_scan)
    fused_j = jax.jit(run_fused)

    ys_s = scan_j(params, (q0,))
    ys_f = fused_j(params, (q0,))
    err = float(jnp.max(jnp.abs(ys_s - ys_f)))
    rel = err / (float(jnp.max(jnp.abs(ys_s))) + 1e-9)

    dt_scan = bench.time_decode(scan_j, params, (q0,))
    dt_fused = bench.time_decode(fused_j, params, (q0,))
    print(json.dumps({
        "metric": "fused_attention_probe_ms_per_generation",
        "xla_scan_ms": round(dt_scan * 1e3, 2),
        "pallas_vmem_ms": round(dt_fused * 1e3, 2),
        "speedup": round(dt_scan / dt_fused, 2),
        "max_abs_diff": err,
        "max_rel_diff": rel,
    }))


if __name__ == "__main__":
    main()
