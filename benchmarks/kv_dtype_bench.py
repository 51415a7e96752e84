"""KV ring-buffer dtype x batch sweep for the AR decode headline.

The decode step is bound by streaming the KV ring buffers
(5 blocks x sum(budgets) x hidden x batch x dtype); bf16 KV made
batch 16 the single-chip sweet spot (README). int8 KV (infer/cache.py)
halves the resident buffers again — this sweep measures whether that
moves the sweet spot to batch 32 and by how much.

    python benchmarks/kv_dtype_bench.py --batches 16 32 --dtypes bf16 int8

One JSON line per (batch, dtype) with frames/s/chip, timed exactly like
bench.py (slope over chained perturbed runs, median of 3 estimates).
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
        mask = sampling_mask_for(frames, "full")
        for name in args.dtypes:
            decode = jax.jit(
                lambda p, bt, d=dt[name]: generate_metaformer(
                    model, p, bt, mask, cache_dtype=d
                )
            )
            try:
                dt_step = bench.time_decode(decode, params, batch)
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                print(json.dumps({
                    "metric": "ar_decode_frames_per_sec_per_chip",
                    "batch": b, "kv": name, "error": str(exc)[:200],
                }))
                continue
            print(json.dumps({
                "metric": "ar_decode_frames_per_sec_per_chip",
                "batch": b,
                "kv": name,
                "value": round(b * frames / dt_step, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
