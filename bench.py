"""Headline benchmark: autoregressive head-motion decode, frames/sec/chip.

Measures the BASELINE.md target metric — batched multi-dialog AR decode
with the flagship Metaformer at the reference's production size
(hidden 256, 5 blocks, lstm embeddings; lstmformer/config.yaml:5,38) over
20-second dialog windows (250 motion frames @ 12.5 fps, the max_len
config, config.yaml:203).

``vs_baseline`` is the speedup over the MEASURED reference baseline —
the reference's own CPU-PyTorch code (mr_gen MultiModalMetaformer +
the head_motion_generation per-step loop, lstmformer.py:466-521) run on
this box at the identical workload. The reference publishes no numbers
(BASELINE.md), so the denominator below was captured with
``python benchmarks/torch_baseline.py`` and is recorded in BASELINE.md;
re-run that script to re-derive it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import numpy as np

# persistent XLA compile cache: the decode program takes minutes to
# build cold; with the cache warm a full bench run is ~1 min
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "MRGEN_JAX_CACHE", os.path.expanduser("~/.cache/mrgen-jax-cache")
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BENCH_CFG = dict(
    main_modal_idx=2,
    hidden_size=256,
    num_block=5,
    dropout=0.0,
    num_layerd=1,
    encoder_num_layer=5,
    num_internal_layer=1,
    residual=True,
    residual_layer_norm=True,
    bias=True,
    emb_mixers=["lstm", "lstm", "lstm"],
    bottleneck_size=64,
    nonlinearity="none",
    ffn_nonlinearity="relu",
    proj_size=0,
    num_heads=4,
    add_bias_kv=False,
    add_zero_attn=False,
    max_context_len=10,
    repeat_with_encoder=False,
    interlayer_residual=False,
    interlayer_residual_norm=True,
    sampling_rate=16000,
    shift=160,
    pred_fps=12.5,
    modalities=["audio", "motion", "motion"],
    use_centroid=True,
    use_angle=True,
    nmels=26,
    delta_order=2,
)

BATCH = 16  # batched multi-dialog decode (BASELINE config #3); 16 is the
# single-chip sweet spot with the shared-KV bf16 decode default
# (measured 2026-08-18: batch 16 105.8k frames/s vs batch 32 72.3k /
# batch 64 75.9k — past 16 the per-step attention work grows faster
# than the step amortizes). The round-2 per-block layout reads 43.0k
# at batch 16 bf16 (and 16.5k f32 — the old VMEM cliff)
FRAMES = 250  # 20 s @ 12.5 fps (motion.max_len)
LEAD = 12  # 24-frame leading warmup at pred_shift 2
RATIO = 8
SAMPLES = int(os.environ.get("MRGEN_BENCH_SAMPLES", "3"))


def make_batch(key, batch=None, frames=None, lead=None):
    b = BATCH if batch is None else batch
    t = FRAMES if frames is None else frames
    ld = LEAD if lead is None else lead
    ks = jax.random.split(key, 7)
    return (
        jax.random.normal(ks[0], (b, t * RATIO, 81)),
        jax.random.normal(ks[1], (b, t, 18)),
        jax.random.normal(ks[2], (b, t, 18)),
        jax.random.normal(ks[3], (b, ld * RATIO, 81)),
        jax.random.normal(ks[4], (b, ld, 18)),
        jax.random.normal(ks[5], (b, ld, 18)),
        jax.random.normal(ks[6], (b, t, 18)),
    )


import jax.numpy as jnp


def _sync(x):
    """Force a real device->host sync (block_until_ready is unreliable on
    tunneled backends; a scalar readback is not)."""
    return float(jnp.asarray(x).ravel()[0])


def time_decode(decode, params, batch, n_small=2, n_large=8, estimates=3):
    """Slope-based timing robust to tunneled-runtime artifacts.

    Chained runs of n_small and n_large iterations; the per-iteration
    time is the slope, cancelling fixed costs (host sync ~28 ms, queue
    setup). Each iteration's inputs are perturbed by a BIT-CHANGING
    function of the previous output: the runtime memoizes executions by
    input content, so the perturbation must actually flip float bits
    (an 1e-12 epsilon underflows in f32 and gets memoized away).
    The slope is re-estimated ``estimates`` times and the MEDIAN taken:
    single slopes vary run-to-run on the shared tunnel."""

    def run(n, out):
        b = batch
        t0 = time.perf_counter()
        for i in range(n):
            eps = jnp.tanh(out[0, 0, 0]) * 1e-3 + i * 1e-4
            b = tuple(x + eps for x in b)
            out = decode(params, b)
        _sync(out)
        return time.perf_counter() - t0, out

    out = decode(params, batch)
    _sync(out)
    _, out = run(1, out)  # absorb residual compiles
    slopes = []
    for _ in range(estimates):
        # CHAIN out through every run: restarting each estimate from the
        # same out would replay a bit-identical dispatch sequence, which
        # the memoizing runtime could serve from cache
        t_small, out = run(n_small, out)
        t_large, out = run(n_large, out)
        slope = (t_large - t_small) / (n_large - n_small)
        if slope > 0:  # noise can make t_small exceed t_large; a clamped
            slopes.append(slope)  # near-zero slope would fabricate an
            # absurd frames/s figure, so discard the estimate instead
    if not slopes:
        raise RuntimeError(
            "all slope estimates were non-positive - timing noise "
            "swamped the measurement; re-run"
        )
    return float(np.median(slopes))


# Reference's own CPU-PyTorch code at the identical workload, measured on
# this box (2026-08-17): 308.64 frames/s at batch 16, torch 2.13.0+cpu,
# 1 CPU. Re-derive with `python benchmarks/torch_baseline.py --batch 16`;
# see BASELINE.md. The recorded workload is asserted in measure():
# changing BATCH/FRAMES/BENCH_CFG invalidates the denominator, so
# re-measure and update both.
TORCH_CPU_REFERENCE = {
    "fps": 308.64,
    "batch": 16,
    "frames": 250,
    "lead": 12,
    "hidden": 256,
    "blocks": 5,
}


def measure():
    # test-only hook: "dur:value[,dur:value...]" makes each fresh
    # --measure child sleep `dur` seconds and report `value` instead of
    # touching the TPU, so tests/test_bench_killproof.py can exercise
    # the streaming-median / budget / SIGTERM machinery on any box.
    # Never set outside tests; real runs leave it unset.
    selftest = os.environ.get("MRGEN_BENCH_SELFTEST")
    if selftest:
        import tempfile

        seq = [s.split(":") for s in selftest.split(",")]
        # fresh children consume entries in order via a counter file
        ctr = os.path.join(
            tempfile.gettempdir(),
            f"mrgen_bench_selftest_{os.environ['MRGEN_BENCH_SELFTEST_ID']}",
        )
        try:
            with open(ctr) as f:
                i = int(f.read())
        except FileNotFoundError:
            i = 0
        with open(ctr, "w") as f:
            f.write(str(i + 1))
        dur, value = seq[min(i, len(seq) - 1)]
        time.sleep(float(dur))
        return {
            "metric": "selftest",
            "value": float(value),
            "unit": "selftest",
            "vs_baseline": 0.0,
        }
    # deferred: keeps selftest children (and the parent, which never
    # touches the model) free of the multi-second flax import
    from multimodalreactiongeneration_tpu.infer.generate import (
        generate_metaformer,
        sampling_mask_for,
    )
    from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer

    ref = TORCH_CPU_REFERENCE
    assert (BATCH, FRAMES, LEAD) == (
        ref["batch"], ref["frames"], ref["lead"]
    ) and (
        BENCH_CFG["hidden_size"],
        BENCH_CFG["num_block"],
    ) == (ref["hidden"], ref["blocks"]), (
        "bench workload changed: re-measure the CPU reference with "
        "benchmarks/torch_baseline.py and update TORCH_CPU_REFERENCE"
    )
    model = Metaformer(cfg=BENCH_CFG)
    batch = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *batch[:6])
    mask = sampling_mask_for(FRAMES, "full")

    # shared-KV bf16 raw ring buffers (the generate_metaformer inference
    # default): one raw buffer per other modality, per-block projections
    # folded into the query/output sides (attend_raw)
    decode = jax.jit(lambda p, b: generate_metaformer(model, p, b, mask))
    dt_scan = time_decode(decode, params, batch)
    fps_chip = BATCH * FRAMES / dt_scan

    return {
        "metric": "ar_decode_head_pose_frames_per_sec_per_chip",
        "value": round(fps_chip, 2),
        "unit": "frames/s/chip (batch 16 x 250 frames, metaformer-256x5, shared bf16 KV)",
        "vs_baseline": round(fps_chip / ref["fps"], 2),
    }


def child_main():
    """One fresh-process measurement (crash-retried once)."""
    import sys

    if "--inner" in sys.argv:
        print(json.dumps(measure()))  # retry child: fail loudly this time
        raise SystemExit(0)
    # the tunneled TPU worker occasionally crashes/restarts mid-run
    # ("TPU worker process crashed or restarted"); one clean retry in a
    # fresh process recovers it
    try:
        print(json.dumps(measure()))
    except Exception as exc:  # noqa: BLE001 - crash class varies
        import time as _time

        print(f"bench attempt 1 failed ({type(exc).__name__}); "
              "retrying in 30 s", file=sys.stderr)
        _time.sleep(30)
        # exec REPLACES this process: on a directly-attached TPU the
        # parent's live client would otherwise hold the chip and the
        # child's backend init would fail with device-in-use
        os.execv(
            sys.executable, [sys.executable, __file__, "--measure", "--inner"]
        )


def _tunnel_alive(timeout: float = 120.0) -> bool:
    """Tiny-matmul liveness probe in a fresh process (a wedged runtime
    blocks forever with no exception, so the probe must be killable)."""
    import subprocess
    import sys

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))"],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        return probe.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _running_median(records):
    """Lower-middle on even counts: with a sample missing, do not let
    the partial "median" read as the more flattering of the survivors."""
    ordered = sorted(records, key=lambda r: r["value"])
    return ordered[(len(ordered) - 1) // 2]


def parent_main():
    """Median over SAMPLES fresh-process measurements, kill-proof.

    Fresh-process runs of the same workload historically span a wide
    band with rare degraded-runtime outliers; a single sample could
    snapshot an outlier and misrepresent the build. Each sample runs in
    its own subprocess (sequentially — one chip).

    The driver runs this under a wall-clock timeout it does not
    advertise (round 3 recorded rc 124 / parsed null because the median
    only printed after ALL samples). Three defenses:

    - the RUNNING median JSON line is printed to stdout after EVERY
      completed sample (last line wins), so a kill at any point after
      the first sample still leaves a parseable record;
    - a total wall budget (env MRGEN_BENCH_BUDGET, default 900 s) stops
      sampling when the next sample cannot plausibly finish in the
      remaining time — the best-so-far median is already on stdout;
    - SIGTERM/SIGINT are trapped to kill the --measure child's whole
      process group before exiting: an orphaned child holds the TPU and
      serializes the next run (see .claude/skills/verify/SKILL.md).

    Set MRGEN_BENCH_SAMPLES=1 for a quick single run.
    """
    import signal
    import subprocess
    import sys

    if SAMPLES <= 1:
        child_main()
        return

    records = []
    child = {"proc": None}

    def _killpg_child():
        proc = child["proc"]
        if proc is not None and proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError, OSError):
                pass

    def _on_signal(signum, frame):  # noqa: ARG001
        # killpg only, no reap: the handler interrupts a blocked
        # communicate() and a reentrant wait could deadlock on Popen's
        # internal lock; we exit immediately so the zombie is the
        # init-reaper's problem, and the TPU-holding group is dead
        _killpg_child()
        if records:  # re-emit so the kill cannot race the last print
            print(json.dumps(_running_median(records)), flush=True)
        # conventional 128+signum; driver only parses the last line
        os._exit(128 + signum)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    budget = float(os.environ.get("MRGEN_BENCH_BUDGET", "900"))
    t_start = time.monotonic()
    # per-sample wall cap: a healthy sample is ~2.5 min warm but
    # ~10-13 min when the persistent compile cache was invalidated by a
    # code change — the cap must not kill a legitimate cold compile.
    # The tunnel occasionally wedges a process in a never-returning RPC
    # ("TPU worker crashed" without an exception) — kill and move on.
    sample_timeout = float(
        os.environ.get("MRGEN_BENCH_SAMPLE_TIMEOUT", "1500")
    )
    last_dur = 150.0  # optimistic floor until a real sample is timed
    attempts = 0
    timeouts = 0
    while len(records) < SAMPLES and attempts < SAMPLES + 4:
        remaining = budget - (time.monotonic() - t_start)
        if records and remaining < last_dur * 1.2:
            print(
                f"bench: wall budget exhausted ({budget:.0f}s, next "
                f"sample needs ~{last_dur:.0f}s); keeping median of "
                f"{len(records)} sample(s)",
                file=sys.stderr,
            )
            break
        attempts += 1
        if timeouts:
            # a wedged tunnel (observed 2026-08-17: even an 8x8 matmul
            # hangs for hours with no exception) sometimes recovers in
            # minutes — space retries instead of burning them
            # back-to-back, and probe with a 2-minute tiny-matmul
            # liveness check before paying another full sample timeout
            time.sleep(120)
            if not _tunnel_alive():
                print(
                    f"bench: tunnel still unresponsive before attempt "
                    f"{attempts}; waiting",
                    file=sys.stderr,
                )
                continue
        # with a record in hand, never let one sample run past the
        # budget; with none, the number matters more than the budget —
        # allow the full per-sample cap and rely on the signal trap
        cap = sample_timeout if not records else max(
            60.0, min(sample_timeout, remaining)
        )
        t_sample = time.monotonic()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            start_new_session=True,  # own pgroup -> killpg reaps execv'd
        )  # retry children too, not just the direct child
        child["proc"] = proc
        try:
            out, err = proc.communicate(timeout=cap)
        except subprocess.TimeoutExpired:
            _killpg_child()
            try:
                proc.communicate(timeout=10)  # reap; group already dead
            except Exception:  # noqa: BLE001 - best-effort
                pass
            timeouts += 1
            print(
                f"bench sample attempt {attempts} timed out after "
                f"{cap:.0f}s (wedged tunnel); skipping",
                file=sys.stderr,
            )
            continue
        finally:
            child["proc"] = None
        sys.stderr.write(err)
        line = out.strip().splitlines()[-1] if out.strip() else ""
        if proc.returncode == 0 and line.startswith("{"):
            rec = json.loads(line)
            records.append(rec)
            last_dur = time.monotonic() - t_sample
            timeouts = 0  # recovered: back-to-back sampling again
            print(
                f"bench sample {len(records)}/{SAMPLES}: {rec['value']} "
                f"({last_dur:.0f}s)",
                file=sys.stderr,
            )
            # stream the running median NOW: if the driver kills the
            # bench later, this line is the record (last line wins)
            print(json.dumps(_running_median(records)), flush=True)
    if not records:
        raise RuntimeError("all bench subprocess samples failed")


if __name__ == "__main__":
    import sys

    if "--measure" in sys.argv:
        child_main()
    else:
        parent_main()
