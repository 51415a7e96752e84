"""Within-process A/B: fused in-kernel dW vs round-4 einsum backward.

The round-4 attribution (BASELINE.md train row) located the backward
wavefront at ~24 ms = ~40% of the 59.5 ms B32 x T240 bf16 train step and
named one surviving lever: accumulate the weight gradients inside the
reverse wavefront kernel (ops/pallas_lstm_stacked.py) instead of
materializing the (B, L, S, 4H) dgates trajectory and reducing it with
full-sequence einsums outside. This probe measures that change in ONE
process — cross-process timings of the same graph vary up to ~1.5x on
the tunneled runtime (BASELINE.md), so only a same-process slope A/B is
meaningful at this granularity.

MRGEN_FUSED_DW is consulted at trace time, so the two variants are two
separately jitted step functions traced under different env settings.

    python benchmarks/fused_dw_ab.py [--batch 32] [--frames 240]
                                     [--precision bf16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_step(args, fused: bool):
    import jax
    import jax.numpy as jnp

    import bench
    from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
    from multimodalreactiongeneration_tpu.train.harness import (
        streaming_step_fns,
    )
    from multimodalreactiongeneration_tpu.train.optim import build_optimizer
    from multimodalreactiongeneration_tpu.utils.config import from_dict

    os.environ["MRGEN_FUSED_DW"] = "1" if fused else "0"
    cfg = dict(bench.BENCH_CFG)
    cfg.update(loss_type="huber", loss_reduction="mean", huber_delta=1.0,
               delta_loss_scale=1.0)
    metrics_cfg = dict(use_centroid=True, use_angle=True, delta_order=2)
    optim_cfg = from_dict(dict(
        use_optimizer="adam", momentum=0.9, weight_decay=1e-2, lr=1e-4,
        use_lr_sched=False, batch_size=args.batch, max_epochs=10,
    ))
    b, t, lead, ratio = args.batch, args.frames, 12, bench.RATIO
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    data = (
        jax.random.normal(ks[0], (b, t * ratio, 81)),
        jax.random.normal(ks[1], (b, t, 18)),
        jax.random.normal(ks[2], (b, t, 18)),
        jax.random.normal(ks[3], (b, lead * ratio, 81)),
        jax.random.normal(ks[4], (b, lead, 18)),
        jax.random.normal(ks[5], (b, lead, 18)),
        jax.random.normal(ks[6], (b, t, 18)),
    )
    lengths = jnp.full((b,), t, jnp.int32)
    batch = [(x, lengths) for x in data]

    model = Metaformer(cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *data[:6])
    optimizer = build_optimizer(optim_cfg, accumulate_grad_batches=1)
    opt_state = jax.jit(optimizer.init)(params)
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    train_step, _ = streaming_step_fns(
        model, cfg, metrics_cfg, optimizer,
        mask_self_motion_input=True,
        compute_dtype=compute_dtype,
    )
    step = jax.jit(train_step, donate_argnums=(0, 1))
    return step, params, opt_state, batch


def time_step(step, params, opt_state, batch):
    import jax
    import numpy as np

    def run(n, params, opt_state):
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            params, opt_state, loss, _ = step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
        float(loss)  # host readback = real sync on the tunnel
        return time.perf_counter() - t0, params, opt_state

    _, params, opt_state = run(2, params, opt_state)  # compile + warm
    slopes = []
    n_small, n_large = 3, 9
    for _ in range(3):
        t_s, params, opt_state = run(n_small, params, opt_state)
        t_l, params, opt_state = run(n_large, params, opt_state)
        slopes.append(max((t_l - t_s) / (n_large - n_small), 1e-9))
    return float(np.median(slopes)) * 1e3


def kernel_only(args):
    """Isolated stacked-kernel grad A/B at the audio-encoder shape
    (B x T*ratio x 4H, L layers): times jax.grad of the raw
    lstm_stacked_recurrence under both MRGEN_FUSED_DW settings in one
    process. Separates kernel-level effects from whole-step noise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from multimodalreactiongeneration_tpu.ops import pallas_lstm_stacked as pls

    b, t, h, L = args.batch, args.frames * bench.RATIO, 256, 5
    mm = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    xw0 = jax.random.normal(ks[0], (b, t, 4 * h)) * 0.3
    w_ih_t = (jax.random.normal(ks[1], (L - 1, h, 4 * h)) * 0.05).astype(mm)
    b_rest = jax.random.normal(ks[2], (L - 1, 4 * h)) * 0.05
    w_hh_t = (jax.random.normal(ks[3], (L, h, 4 * h)) * 0.05).astype(mm)
    h0 = jnp.zeros((L, b, h))
    c0 = jnp.zeros((L, b, h))

    def build(fused):
        os.environ["MRGEN_FUSED_DW"] = "1" if fused else "0"

        def loss(xw0, w_ih_t, b_rest, w_hh_t):
            ys, (hn, cn) = pls.lstm_stacked_recurrence(
                xw0, w_ih_t, b_rest, w_hh_t, h0, c0
            )
            return jnp.sum(ys ** 2) + jnp.sum(hn) + jnp.sum(cn)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    def timeit(fn):
        out = fn(xw0, w_ih_t, b_rest, w_hh_t)
        float(out[0].ravel()[0])  # host readback = the only real sync
        x = xw0

        def run(n, x):
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(x, w_ih_t, b_rest, w_hh_t)
                x = x + jnp.tanh(out[0]) * 1e-4  # defeat memoization
            # jax.block_until_ready does NOT block on the axon tunnel
            # (verify skill) — a scalar readback is the real sync
            float(out[0].ravel()[0])
            return time.perf_counter() - t0, x

        slopes = []
        for _ in range(3):
            t_s, x = run(2, x)
            t_l, x = run(6, x)
            slopes.append(max((t_l - t_s) / 4, 1e-9))
        return float(np.median(slopes)) * 1e3

    f_old = build(False)
    f_new = build(True)
    rec = {
        "metric": "fused_dw_kernel_grad_ab",
        "unit": f"ms/grad (B{b} x T{t} x H{h} x L{L}, {args.precision})",
        "unfused_ms": round(timeit(f_old), 2),
        "fused_ms": round(timeit(f_new), 2),
    }
    rec["unfused_ms_2"] = round(timeit(f_old), 2)
    rec["fused_ms_2"] = round(timeit(f_new), 2)
    print(json.dumps(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--precision", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--kernel-only", action="store_true")
    args = ap.parse_args()
    os.environ["MRGEN_RNN_IMPL"] = args.impl
    if args.kernel_only:
        kernel_only(args)
        return

    results = {}
    # measure in both orders would double the wall; interleave instead:
    # build both steps first (separate trace-time env), then alternate
    # timing rounds so drift hits both variants equally
    step_old = build_step(args, fused=False)
    step_new = build_step(args, fused=True)
    results["unfused_ms"] = round(time_step(*step_old), 2)
    results["fused_ms"] = round(time_step(*step_new), 2)
    # second pass, reversed order, to expose drift
    step_new2 = build_step(args, fused=True)
    step_old2 = build_step(args, fused=False)
    results["fused_ms_2"] = round(time_step(*step_new2), 2)
    results["unfused_ms_2"] = round(time_step(*step_old2), 2)

    best_old = min(results["unfused_ms"], results["unfused_ms_2"])
    best_new = min(results["fused_ms"], results["fused_ms_2"])
    record = {
        "metric": "fused_dw_train_step_ab",
        "unit": f"ms/step (B{args.batch} x T{args.frames}, "
                f"{args.precision}, metaformer 256x5)",
        **results,
        "speedup": round(best_old / best_new, 3),
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
