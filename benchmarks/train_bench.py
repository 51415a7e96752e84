"""Reproducible full-train-step benchmark (fwd + bwd + adam on TPU).

Backs the README table row: Metaformer production size (hidden 256,
5 blocks, lstm embeddings — configs/lstmformer.yaml:5,38) at B32 x T240,
the largest static bucket the production loader emits. Run once per RNN
implementation to reproduce the Pallas-vs-scan comparison:

    python benchmarks/train_bench.py --impl pallas
    python benchmarks/train_bench.py --impl scan

Timing is slope-based like bench.time_decode, but chaining is natural
here: each step's donated (params, opt_state) feed the next, so inputs
change every iteration and the tunneled runtime cannot memoize. Prints
one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# LSTMwithSample at production size (configs/lstm_with_sampling.yaml):
# sampler 128 x 2 layers over the FULL 100 Hz audio sequence (the
# 2-layer stack runs as one wavefront kernel, ops/pallas_lstm_stacked),
# prediction stack 256 x 2 blocks
LWS_CFG = dict(
    nmels=26,
    delta_order=2,
    use_centroid=True,
    use_angle=True,
    sampler_hidden_size=128,
    sampler_num_layers=2,
    sampler_dropout_rate=0.0,
    sampling_rate=16000,
    shift=160,
    fps=25,
    pred_fps=12.5,
    hidden_size=256,
    bottleneck_size=64,
    num_layers=2,
    num_lstm=1,
    dropout_rate=0.0,
    use_layer_norm=True,
    use_relu=True,
    use_mixing=False,
    use_residual=True,
    delta_loss_scale=1.0,
    loss_type="huber",
    loss_reduction="mean",
    huber_delta=1.0,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["auto", "scan", "pallas"],
                    default="auto")
    ap.add_argument("--model", choices=["metaformer", "lws"],
                    default="metaformer")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--precision", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microsteps per optimizer "
                         "update (optax.MultiSteps, the production "
                         "trainer.accumulate_grad_batches path) — the "
                         "answer to effective batches whose trajectory "
                         "residuals OOM 16 GB HBM (B128 x T240)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the forward in the backward pass "
                         "(jax.checkpoint, the trainer.remat=true path) — "
                         "lets batches whose trajectory residuals OOM HBM "
                         "compile, at recompute cost")
    ap.add_argument("--breakdown", action="store_true",
                    help="also time fwd-only / fwd+bwd / block-0-only "
                         "components to show where the step goes "
                         "(metaformer only)")
    args = ap.parse_args()
    # resolve_impl consults the env at trace time (nn/recurrent.py:34-50)
    os.environ["MRGEN_RNN_IMPL"] = args.impl

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
    from multimodalreactiongeneration_tpu.train.harness import (
        streaming_step_fns,
    )
    from multimodalreactiongeneration_tpu.train.optim import build_optimizer
    from multimodalreactiongeneration_tpu.utils.config import from_dict

    if args.model == "lws":
        cfg = dict(LWS_CFG)
    else:
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

    if args.model == "lws":
        from multimodalreactiongeneration_tpu.models.lstm_with_sampling import (
            LSTMwithSample,
        )

        model = LSTMwithSample(cfg=cfg)
    else:
        model = Metaformer(cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *data[:6])
    optimizer = build_optimizer(optim_cfg,
                                accumulate_grad_batches=args.accum)
    opt_state = jax.jit(optimizer.init)(params)
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    train_step, _ = streaming_step_fns(
        model, cfg, metrics_cfg, optimizer,
        # matches train/cli.py: the metaformer masks -100 self-motion
        # inputs; LSTMwithSample feeds them raw (reference parity)
        mask_self_motion_input=(args.model == "metaformer"),
        compute_dtype=compute_dtype,
        remat=args.remat,
    )
    step = jax.jit(train_step, donate_argnums=(0, 1))

    def run(n, params, opt_state):
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            params, opt_state, loss, _ = step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
        dt = None
        if loss is not None:
            float(loss)  # host readback = real sync on the tunnel
            dt = time.perf_counter() - t0
        return dt, params, opt_state

    _, params, opt_state = run(2, params, opt_state)  # compile + warm
    slopes = []
    n_small, n_large = 3, 9
    for _ in range(3):
        t_small, params, opt_state = run(n_small, params, opt_state)
        t_large, params, opt_state = run(n_large, params, opt_state)
        slopes.append(max((t_large - t_small) / (n_large - n_small), 1e-9))
    ms = float(np.median(slopes)) * 1e3

    # MFU: XLA's own flop count for the compiled step over the measured
    # time, against v5e bf16 peak (197 TFLOP/s). The model is a stack of
    # SEQUENTIAL recurrences (audio encoder: 5 layers x 1920 scan steps
    # of B x 256 matmuls), so low MFU here means latency-bound scan
    # iterations, not a missing optimization — see --breakdown.
    V5E_PEAK_TFLOPS = 197.0
    mfu_pct = tflops_per_s = None
    try:
        compiled = step.lower(params, opt_state, batch,
                              jax.random.PRNGKey(0)).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            tflops_per_s = flops / (ms / 1e3) / 1e12
            mfu_pct = 100.0 * tflops_per_s / V5E_PEAK_TFLOPS
    except Exception as exc:  # noqa: BLE001 - backend-dependent API
        print(f"cost_analysis unavailable: {exc}", file=sys.stderr)

    desc = ("256x5 lstm-emb" if args.model == "metaformer"
            else "lws sampler128x2 + lstm256x2")
    record = {
        "metric": f"{args.model}_train_step_ms",
        "value": round(ms, 2),
        "unit": f"ms/step (B{b} x T{t}, {desc}, impl={args.impl}, "
                f"{args.precision}, fwd+bwd+adam"
                f"{', remat' if args.remat else ''})",
    }
    if args.accum > 1:
        # ms above is per MICROSTEP (one fwd+bwd on B; the optimizer
        # applies on every accum-th call). The effective optimizer step
        # covers accum microbatches = an effective batch of B*accum,
        # which would OOM HBM if materialized as one trajectory.
        record["accum"] = args.accum
        record["effective_batch"] = b * args.accum
        record["effective_step_ms"] = round(ms * args.accum, 2)
    record["train_frames_per_s"] = round(b * t / (ms / 1e3), 1)
    if mfu_pct is not None:
        record["tflops_per_s"] = round(tflops_per_s, 2)
        record["mfu_pct_v5e_bf16_peak"] = round(mfu_pct, 2)

    if args.breakdown and args.model == "metaformer":
        def time_component(fn, params_, batch_):
            """Slope timing with bit-changing input perturbation (the
            tunneled runtime memoizes executions by input content, so
            repeating identical inputs would time the cache). Median of
            3 slope estimates; negative slopes (tunnel noise) dropped."""
            out = fn(params_, batch_)
            float(out[0])

            def run_n(n, out):
                bt = batch_
                t0 = time.perf_counter()
                for i in range(n):
                    eps = jnp.tanh(out[0]) * 1e-3 + i * 1e-4
                    # keep each leaf's dtype: x + f32 eps would promote
                    # bf16 inputs and silently time an f32 graph
                    bt = [(x + eps.astype(x.dtype), l) for x, l in bt]
                    out = fn(params_, bt)
                float(out[0])
                return time.perf_counter() - t0, out

            comp_slopes = []
            for _ in range(3):
                t_s, out = run_n(n_small, out)
                t_l, out = run_n(n_large, out)
                s = (t_l - t_s) / (n_large - n_small)
                if s > 0:
                    comp_slopes.append(s)
            if not comp_slopes:
                return None
            return float(np.median(comp_slopes)) * 1e3

        def r2(x):
            return None if x is None else round(x, 2)

        # eval_step does NOT apply compute_dtype internally (training
        # eval is f32 by design) — cast params/batch up front so the
        # bf16 breakdown actually times bf16 graphs (input dtypes
        # propagate through the flax modules)
        from multimodalreactiongeneration_tpu.train.harness import (
            _cast_tree,
        )

        if compute_dtype != jnp.float32:
            params = _cast_tree(params, compute_dtype)
            batch = _cast_tree(batch, compute_dtype)

        _, eval_step = streaming_step_fns(
            model, cfg, metrics_cfg, optimizer, mask_self_motion_input=True,
            compute_dtype=compute_dtype,
        )
        fwd = jax.jit(eval_step)
        record["fwd_ms"] = r2(time_component(fwd, params, batch))

        grad_fn = jax.jit(
            lambda p, bt: jax.value_and_grad(
                lambda pp: eval_step(pp, bt)[0]
            )(p)
        )
        record["fwd_bwd_ms"] = r2(time_component(grad_fn, params, batch))

        # block-0-only model: carries ALL three modality encoders (the
        # audio encoder alone is a 5-layer x 1920-step recurrence);
        # blocks 1..4 add main-emb + integrators + FFN per block
        cfg1 = dict(cfg, num_block=1)
        model1 = Metaformer(cfg=cfg1)
        params1 = jax.jit(model1.init)(jax.random.PRNGKey(1), *data[:6])
        if compute_dtype != jnp.float32:
            params1 = _cast_tree(params1, compute_dtype)
        _, eval1 = streaming_step_fns(
            model1, cfg1, metrics_cfg, optimizer,
            mask_self_motion_input=True, compute_dtype=compute_dtype,
        )
        fwd1 = jax.jit(eval1)
        record["fwd_block0_only_ms"] = r2(
            time_component(fwd1, params1, batch)
        )

    print(json.dumps(record))


if __name__ == "__main__":
    main()
