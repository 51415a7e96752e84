"""Streaming reaction-generation latency benchmark (ms/frame, batch 1).

BASELINE.md config #5: persistent decode state + incremental fbank at
the 12.5 fps motion hop; budget = one motion frame every 80 ms (and
<40 ms to leave half the period for capture/render). Unlike the batch
decode benchmark, every step RETURNS the frame to the host — the
readback is part of the serving loop, so plain wall-clock per step is
the honest metric (no slope trick needed; inputs differ every step so
the runtime cannot memoize).

Usage: python benchmarks/streaming_bench.py [--steps 200] [--hidden 256]
Prints one JSON line with mean/p50/p95 ms per frame.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=5)
    args = ap.parse_args()
    if args.steps < 1:
        ap.error("--steps must be >= 1")

    # import after the arg parse so --help is instant
    import jax
    import numpy as np

    import bench
    from multimodalreactiongeneration_tpu.infer.streaming import (
        StreamingSession,
    )
    from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer

    cfg = dict(bench.BENCH_CFG, hidden_size=args.hidden,
               num_block=args.blocks)
    model = Metaformer(cfg=cfg)
    rng = np.random.default_rng(0)
    lead = 12
    ratio = bench.RATIO
    ex = bench.make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *ex[:6])

    session = StreamingSession(model, params, batch=1)
    session.prime(
        np.asarray(ex[3][:1, : lead * ratio]),
        np.asarray(ex[4][:1]),
        np.asarray(ex[5][:1]),
    )

    hop = session.hop_samples
    # warmup: compile the step
    for _ in range(3):
        session.step(
            rng.standard_normal((1, hop), dtype=np.float32) * 0.1,
            rng.standard_normal((1, 1, 18)).astype(np.float32),
        )

    times = []
    for _ in range(args.steps):
        audio = rng.standard_normal((1, hop), dtype=np.float32) * 0.1
        mp = rng.standard_normal((1, 1, 18)).astype(np.float32)
        t0 = time.perf_counter()
        y = session.step(audio, mp)
        times.append((time.perf_counter() - t0) * 1e3)
    assert np.isfinite(y).all()
    times = np.array(times)
    print(
        json.dumps(
            {
                "metric": "streaming_decode_ms_per_frame",
                "value": round(float(np.mean(times)), 2),
                "unit": f"ms/frame (batch 1, metaformer-{args.hidden}x{args.blocks}, budget 80 ms @ 12.5 fps)",
                "p50_ms": round(float(np.percentile(times, 50)), 2),
                "p95_ms": round(float(np.percentile(times, 95)), 2),
                "steps": args.steps,
            }
        )
    )


if __name__ == "__main__":
    main()
