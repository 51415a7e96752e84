"""Ablation probe: where does the wavefront stacked-LSTM kernel's time go?

The production train step is bound by the modality encoders' recurrence
(ops/pallas_lstm_stacked.py; the audio encoder alone is a 5-layer x 1920
-step wavefront). BASELINE.md's accumulation-schedule study measured the
per-SAMPLE cost to be batch-invariant (B64 = 2.07x B32), which rules out
MXU issue latency as the binding constraint (that would amortize with M)
and implicates per-element work: VPU cell math (sigmoid/tanh chains) and
trajectory stores, both linear in B.

This probe times the ISOLATED forward kernel at the audio-encoder shape
and then re-times it with parts ablated (each variant is a copy of the
kernel body with one cost removed — numerics are intentionally invalid
for everything but `full`):

  full     the production kernel body (baseline)
  noact    sigmoid/tanh replaced by cheap linear maps — times the
           matmul chain + stores skeleton
  nostore  hs/cs/gs trajectory outputs shrunk to one chunk (constant
           index map: Pallas writes the block back once, killing the
           HBM write stream) — times matmuls + cell math
  matmul   both ablations — the bare wavefront matmul chain

The difference full-noact is the VPU transcendental cost; full-nostore
is the trajectory-store cost; matmul is the floor the MXU schedule sets.
Timing is slope-based with bit-changing perturbation (verify skill: the
tunneled runtime memoizes by input content). Prints one JSON line.

Usage: python benchmarks/stacked_kernel_probe.py [--batch 32] [--t 1920]
       [--layers 5] [--hidden 256] [--dtype bf16]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalreactiongeneration_tpu.ops.pallas_lstm_stacked import (  # noqa: E402
    CHUNK_S,
    _COMPILER_PARAMS,
    _pad_slots,
    _slot_pad_len,
)


def _split_gates(gates, h, cheap):
    if cheap:
        # linear stand-ins with the same operand shapes/dtypes: ablates
        # ONLY the transcendental expansion, keeps every mul/add
        ii = gates[:, :h] * 0.25 + 0.5
        ff = gates[:, h : 2 * h] * 0.25 + 0.5
        gg = gates[:, 2 * h : 3 * h] * 0.1
        oo = gates[:, 3 * h :] * 0.25 + 0.5
    else:
        ii = jax.nn.sigmoid(gates[:, :h])
        ff = jax.nn.sigmoid(gates[:, h : 2 * h])
        gg = jnp.tanh(gates[:, 2 * h : 3 * h])
        oo = jax.nn.sigmoid(gates[:, 3 * h :])
    return ii, ff, gg, oo


def _fwd_kernel(
    xw0_ref, wih_ref, b_ref, whh_ref, h0_ref, c0_ref,
    hs_ref, cs_ref, gs_ref, hn_ref, cn_ref,
    h_scr, c_scr,
    *, t_real, num_layers, cheap_act,
):
    """Copy of pallas_lstm_stacked._fwd_kernel with ablation hooks (the
    production kernel stays unpolluted; this probe is benchmark-only)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = xw0_ref.shape[1]
    hdim = h_scr.shape[-1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    def body(i, _):
        s = t * tc + i
        h_prev = h_scr[:]
        for l in range(num_layers):
            if l == 0:
                gin = xw0_ref[:, i]
            else:
                gin = (
                    jnp.dot(
                        h_prev[:, l - 1].astype(wih_ref.dtype),
                        wih_ref[l - 1],
                        preferred_element_type=jnp.float32,
                    )
                    + b_ref[l - 1]
                )
            gates = gin + jnp.dot(
                h_prev[:, l].astype(whh_ref.dtype),
                whh_ref[l],
                preferred_element_type=jnp.float32,
            )
            gs_ref[:, l, i] = gates
            ii, ff, gg, oo = _split_gates(gates, hdim, cheap_act)
            c = ff * c_scr[:, l] + ii * gg
            if cheap_act:
                h = oo * (c * 0.5)
            else:
                h = oo * jnp.tanh(c)
            valid = jnp.logical_and(s >= l, s < l + t_real)
            h_new = jnp.where(valid, h, h_prev[:, l])
            c_new = jnp.where(valid, c, c_scr[:, l])
            h_scr[:, l] = h_new
            c_scr[:, l] = c_new
            hs_ref[:, l, i] = h_new
            cs_ref[:, l, i] = c_new
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        hn_ref[:] = h_scr[:]
        cn_ref[:] = c_scr[:]


def make_fwd(t_real: int, cheap_act: bool, no_store: bool):
    def fwd(xw0s, w_ih_t, b_rest, w_hh_t, h0, c0):
        b, s_pad, g4 = xw0s.shape
        num_layers = w_hh_t.shape[0]
        h = g4 // 4
        nt = s_pad // CHUNK_S

        if no_store:
            # constant index map: Pallas writes each trajectory block
            # back once (last visit), ablating the HBM write stream
            chunk = lambda d: pl.BlockSpec(
                (b, num_layers, CHUNK_S, d),
                lambda t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            traj_len = CHUNK_S
        else:
            chunk = lambda d: pl.BlockSpec(
                (b, num_layers, CHUNK_S, d),
                lambda t: (0, 0, t, 0),
                memory_space=pltpu.VMEM,
            )
            traj_len = s_pad
        state = pl.BlockSpec(
            (b, num_layers, h), lambda t: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        full = lambda shape: pl.BlockSpec(
            shape, lambda t: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel, t_real=t_real, num_layers=num_layers,
                cheap_act=cheap_act,
            ),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec(
                    (b, CHUNK_S, g4), lambda t: (0, t, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(w_ih_t.shape),
                full(b_rest.shape),
                full(w_hh_t.shape),
                state,
                state,
            ],
            out_specs=(chunk(h), chunk(h), chunk(g4), state, state),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (b, num_layers, traj_len, h), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (b, num_layers, traj_len, h), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (b, num_layers, traj_len, g4), jnp.float32
                ),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM((b, num_layers, h), jnp.float32),
                pltpu.VMEM((b, num_layers, h), jnp.float32),
            ],
        )(xw0s, w_ih_t, b_rest, w_hh_t, h0, c0)

    return fwd


def time_fn(fn, args, n_small=2, n_large=6, estimates=3):
    out = fn(*args)
    float(jnp.asarray(out[3]).ravel()[0])

    def run(n, out):
        a = args
        t0 = time.perf_counter()
        for i in range(n):
            eps = jnp.tanh(out[3].ravel()[0]) * 1e-3 + i * 1e-4
            a = (a[0] + eps,) + a[1:]
            out = fn(*a)
        float(jnp.asarray(out[3]).ravel()[0])
        return time.perf_counter() - t0, out

    _, out = run(1, out)
    slopes = []
    for _ in range(estimates):
        t_s, out = run(n_small, out)
        t_l, out = run(n_large, out)
        s = (t_l - t_s) / (n_large - n_small)
        if s > 0:
            slopes.append(s)
    # ablated variants have intentionally invalid numerics (e.g. ff can
    # exceed 1) and may diverge to NaN over long T — a NaN state makes
    # every perturbed input identically all-NaN, re-enabling the
    # runtime's content memoization and silently deflating the timing
    if not bool(jnp.isfinite(out[3]).all()):
        print(
            "WARNING: non-finite final state — measurement discarded "
            "(content-memoization hazard)",
            file=sys.stderr,
        )
        return None
    return float(np.median(slopes)) * 1e3 if slopes else None


def main():
    # first-wins cache setup INSIDE main: importing this module (the
    # test suite does) must not redirect the process's compile cache
    from multimodalreactiongeneration_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache(
        os.environ.get("MRGEN_JAX_CACHE", "~/.cache/mrgen-jax-cache")
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=1920)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    args = ap.parse_args()

    b, t, L, h = args.batch, args.t, args.layers, args.hidden
    wdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    s_pad = _slot_pad_len(t, L)
    xw0 = jax.random.normal(ks[0], (b, t, 4 * h)) * 0.5
    xw0s = _pad_slots(xw0, 1, s_pad)
    w_ih_t = (jax.random.normal(ks[1], (L - 1, h, 4 * h)) * 0.05).astype(wdt)
    b_rest = jax.random.normal(ks[2], (L - 1, 4 * h)) * 0.05
    w_hh_t = (jax.random.normal(ks[3], (L, h, 4 * h)) * 0.05).astype(wdt)
    h0 = jax.random.normal(ks[4], (b, L, h)) * 0.1
    c0 = jax.random.normal(ks[5], (b, L, h)) * 0.1
    inp = (xw0s, w_ih_t, b_rest, w_hh_t, h0, c0)

    record = {
        "metric": "stacked_kernel_fwd_ablation_ms",
        "shape": f"B{b} x T{t}, L{L} x H{h}, weights {args.dtype}",
    }
    variants = [
        ("full", False, False),
        ("noact", True, False),
        ("nostore", False, True),
        ("matmul", True, True),
    ]
    for name, cheap, nostore in variants:
        fn = jax.jit(make_fwd(t, cheap, nostore))
        ms = time_fn(fn, inp)
        record[name + "_ms"] = None if ms is None else round(ms, 2)
        print(f"{name}: {record[name + '_ms']} ms", file=sys.stderr)
    # `is not None`, not truthiness: a legitimate 0.0 ms reading (after
    # round) must not suppress the derived fields
    if record["full_ms"] is not None and record["noact_ms"] is not None:
        record["act_cost_ms"] = round(
            record["full_ms"] - record["noact_ms"], 2
        )
    if record["full_ms"] is not None and record["nostore_ms"] is not None:
        record["store_cost_ms"] = round(
            record["full_ms"] - record["nostore_ms"], 2
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
