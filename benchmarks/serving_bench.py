"""Serving capacity benchmark: concurrent 12.5 fps sessions per chip.

Drives infer/serving.ServingEngine at the production Metaformer size
(bench.py BENCH_CFG) with every slot attached, measuring the sustained
wall-clock per step() — one frame for ALL sessions. A slot count is
sustainable when the step fits the 80 ms frame interval (12.5 fps).

Note the wall time includes this environment's host<->device tunnel
round-trip (~28 ms, see the verify skill); on a directly-attached host
the sustainable slot count is correspondingly higher.

Usage: python benchmarks/serving_bench.py [--slots 8 16 32] [--steps 50]
Prints one JSON line per slot count.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

FRAME_BUDGET_MS = 80.0  # one 12.5 fps frame interval


def run(slots: int, steps: int, kv="bf16", churn_every: int = 0) -> dict:
    import jax

    import bench
    from multimodalreactiongeneration_tpu.infer.serving import ServingEngine
    from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer

    model = Metaformer(cfg=bench.BENCH_CFG)
    init_in = (
        np.zeros((1, 8, 81), np.float32),
        np.zeros((1, 1, 18), np.float32),
        np.zeros((1, 1, 18), np.float32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_in)

    import jax.numpy as jnp

    cache_dtype = jnp.int8 if kv == "int8" else jnp.bfloat16
    engine = ServingEngine(model, params, slots=slots,
                           cache_dtype=cache_dtype)
    rng = np.random.default_rng(0)
    lead = (
        rng.normal(size=(1, 12 * 8, 81)).astype(np.float32),
        rng.normal(size=(1, 12, 18)).astype(np.float32),
        rng.normal(size=(1, 12, 18)).astype(np.float32),
    )
    for _ in range(slots):
        engine.attach(*lead)

    audio = (0.1 * rng.standard_normal(
        (steps, slots, engine.hop_samples)
    )).astype(np.float32)
    mp = rng.normal(size=(steps, slots, 1, 18)).astype(np.float32)

    engine.step(audio[0], mp[0])  # compile
    times = []
    churn_slot = 0
    for t in range(steps):
        t0 = time.perf_counter()
        if churn_every and t >= 5 and t % churn_every == 0:
            # session lifecycle inside the frame interval: one session
            # ends and a new one (with its lead warmup) takes the slot
            engine.detach(churn_slot)
            churn_slot = engine.attach(*lead)
        out = engine.step(audio[t], mp[t])
        # engine.step returns a host ndarray — the np.asarray readback
        # inside is a real device sync even on the tunnel
        assert np.isfinite(out).all()
        times.append(time.perf_counter() - t0)
    times = np.asarray(times[5:]) * 1e3  # drop warm-in steps
    p50, p95, p99 = (
        float(np.percentile(times, p)) for p in (50, 95, 99)
    )
    return {
        "metric": "serving_step_ms",
        "value": round(float(np.mean(times)), 2),
        "p50_ms": round(p50, 2),
        "p95_ms": round(p95, 2),
        "p99_ms": round(p99, 2),
        "max_ms": round(float(times.max()), 2),
        "churn_every": churn_every,
        "unit": (
            f"ms/frame for {slots} concurrent sessions "
            f"(budget {FRAME_BUDGET_MS:.0f} ms @ 12.5 fps, "
            f"metaformer-256x5, {kv} KV"
            + (f", attach/detach every {churn_every} steps"
               if churn_every else "")
            + ")"
        ),
        "sustains_12_5_fps": bool(p95 < FRAME_BUDGET_MS),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16",
                    help="KV ring-buffer dtype (int8 halves pooled VMEM)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--churn-every", type=int, default=0,
                    help="detach+attach one session every N steps "
                         "(0 = steady pool); the lifecycle cost lands "
                         "inside the timed frame interval")
    args = ap.parse_args()
    if args.steps < 10:
        ap.error("--steps must be >= 10 (the first 5 are dropped as warm-in)")
    for s in args.slots:
        print(json.dumps(run(s, args.steps, kv=args.kv,
                             churn_every=args.churn_every)))


if __name__ == "__main__":
    main()
