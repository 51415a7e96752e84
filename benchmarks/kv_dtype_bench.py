"""KV layout x dtype x batch sweep for the AR decode headline.

Two KV layouts (infer/generate.py): "shared" keeps ONE raw ring buffer
per other modality with per-block projections folded at attention time
(10x smaller state — the inference default, 105.8k frames/s at batch
16 bf16 on v5e, 2026-08-18); "per_block" keeps projected K/V per
(block, integrator, layer) — required for int8 (per-slot scales) and
repeat_with_encoder, bound by streaming 5 blocks x sum(budgets) x
hidden x batch x dtype (43.0k at batch 16 bf16; int8 halves the
buffers and moves its VMEM cliff: 34.6k@16, 39.2k@32).

    python benchmarks/kv_dtype_bench.py --batches 16 32 \
        --dtypes bf16 int8 [--layouts shared per_block]

One JSON line per (batch, dtype, layout) with frames/s/chip, timed
exactly like bench.py (slope over chained perturbed runs, median of 3
estimates). int8 always reports the per-block layout (the fallback
generate_metaformer applies).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--dtypes", nargs="+", default=["bf16", "int8"],
                    choices=["f32", "bf16", "int8"])
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--layouts", nargs="+", default=["shared"],
                    choices=["shared", "per_block"])
    ap.add_argument("--hoist", default="auto", choices=["auto", "off"],
                    help="encoder hoist (generate_metaformer "
                    "hoist_encoders); 'off' forces the in-loop encoders")
    ap.add_argument("--param-dtype", default="f32",
                    choices=["f32", "bf16"],
                    help="cast model params for the decode (bf16 halves "
                    "the per-step HBM param traffic; drift-bounding "
                    "tests in tests/test_generate.py gate any default "
                    "change)")
    ap.add_argument("--fused", default="auto",
                    choices=["auto", "off"],
                    help="fused Pallas rollout: 'auto' measures the "
                    "production default (bf16+shared rows may route "
                    "through ops/pallas_decode_rollout.py — each row's "
                    "'fused' field says which path actually ran, so "
                    "layout/dtype comparisons stay attributable); "
                    "'off' pins every row to the XLA scan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from multimodalreactiongeneration_tpu.infer.generate import (
        generate_metaformer,
        sampling_mask_for,
    )
    from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer

    dt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}
    model = Metaformer(cfg=bench.BENCH_CFG)
    frames = args.frames

    for b in args.batches:
        batch = bench.make_batch(
            jax.random.PRNGKey(0), batch=b, frames=frames
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(1), *batch[:6])
        if args.param_dtype == "bf16":
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                params,
            )
        mask = sampling_mask_for(frames, "full")
        hoist = "auto" if args.hoist == "auto" else False
        for name in args.dtypes:
            layouts = ["per_block"] if name == "int8" else args.layouts
            for layout in layouts:
                fused = False if args.fused == "off" else "auto"
                decode = jax.jit(
                    lambda p, bt, d=dt[name], lay=layout: generate_metaformer(
                        model, p, bt, mask, cache_dtype=d, kv_layout=lay,
                        hoist_encoders=hoist, fused_rollout=fused,
                    )
                )
                # report which path "auto" actually resolved to (shared
                # bf16 rows may run the fused kernel; attributing its
                # speedup to the layout axis would corrupt comparisons)
                from multimodalreactiongeneration_tpu.infer.generate import (
                    _resolve_fused,
                )
                from multimodalreactiongeneration_tpu.models.lstmformer import (
                    derived_sizes,
                )
                ratio = derived_sizes(bench.BENCH_CFG)["ratio"]
                fused_ran = bool(fused) and bool(hoist) and \
                    layout == "shared" and \
                    _resolve_fused(fused, bench.BENCH_CFG, dt[name],
                                   ratio, b, batch[3].shape[1])
                try:
                    dt_step = bench.time_decode(decode, params, batch)
                except Exception as exc:  # noqa: BLE001 — keep sweeping
                    print(json.dumps({
                        "metric": "ar_decode_frames_per_sec_per_chip",
                        "batch": b, "kv": name, "layout": layout,
                        "error": str(exc)[:200],
                    }))
                    continue
                print(json.dumps({
                    "metric": "ar_decode_frames_per_sec_per_chip",
                    "batch": b,
                    "kv": name,
                    "layout": layout,
                    "hoist": args.hoist,
                    "params": args.param_dtype,
                    "fused": fused_ran,
                    "value": round(b * frames / dt_step, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
