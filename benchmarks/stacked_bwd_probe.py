"""Ablation probe: where does the stacked-LSTM BACKWARD wavefront go?

Round 4 located the backward wavefront at ~24 ms = ~40% of the B32xT240
bf16 train step (~2.4x its forward); round 5's fused-dW kernel
(ops/pallas_lstm_stacked.py _bwd_kernel_fused) measured DEAD-EVEN with
the einsum path — the dgates-trajectory HBM round-trip was fully hidden
by the slot-serial chain, so the remaining question is what the chain
itself is spending. This probe times the ISOLATED fused backward kernel
at the audio-encoder shape with parts ablated (each variant is a copy
of the kernel body with one cost removed — numerics are intentionally
invalid for everything but `full`):

  full     the production fused backward (baseline)
  noact    sigmoid/tanh recompute replaced by cheap linear maps
  noderiv  dgates = gates passthrough — ablates the entire derivative
           chain INCLUDING the 4-way lane concat (keeps both matmuls,
           stores, accumulation)
  nody     the dy matmul (dg_p @ W_ih, K=4H) replaced by a slice
  nodh     the dh_prev matmul (dgates @ W_hh, K=4H) replaced by a slice
  noacc    chunk-level dW accumulation matmuls skipped
  skeleton noact + noderiv — the bare reverse matmul chain

Differences full-minus-variant attribute the cost. Timing is
slope-based with bit-changing perturbation (the tunneled runtime
memoizes executions by input content); non-finite final states discard
the measurement (content-memoization hazard, see ADVICE r4).

Usage: python benchmarks/stacked_bwd_probe.py [--batch 32] [--t 1920]
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
    _slot_pad_len,
)


def _acts(gates, h, cheap):
    if cheap:
        ii = gates[:, :h] * 0.25 + 0.5
        ff = gates[:, h : 2 * h] * 0.2 + 0.4
        gg = gates[:, 2 * h : 3 * h] * 0.1
        oo = gates[:, 3 * h :] * 0.25 + 0.5
    else:
        ii = jax.nn.sigmoid(gates[:, :h])
        ff = jax.nn.sigmoid(gates[:, h : 2 * h])
        gg = jnp.tanh(gates[:, 2 * h : 3 * h])
        oo = jax.nn.sigmoid(gates[:, 3 * h :])
    return ii, ff, gg, oo


def _tile4(x):
    return jnp.concatenate([x, x, x, x], axis=-1)


def _bwd_kernel_probe(
    gs_ref, csp_ref, hsp_ref, dys_ref, wih_ref, whh_ref, dhn_ref, dcn_ref,
    dg0_ref, dh0_ref, dc0_ref, dwhh_ref, dwih_ref, db_ref,
    dh_scr, dc_scr, dgp_scr, dgc_scr,
    *, t_real, num_layers, cheap_act, no_deriv, no_dy, no_dh, no_acc,
    wide_transc=False, preacts=False,
):
    """Copy of _bwd_kernel_fused with ablation hooks (the production
    kernel stays unpolluted; benchmark-only)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = gs_ref.shape[2]
    hdim = gs_ref.shape[-1] // 4  # csp is 4H-wide in preacts mode
    b = gs_ref.shape[0]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]
        dgp_scr[:] = jnp.zeros_like(dgp_scr)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # per-quarter lane masks / scales for the wide variants, built once
    # per grid step from the lane iota (no extra kernel inputs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 4 * hdim), 1)
    mask_g = jnp.logical_and(lane >= 2 * hdim, lane < 3 * hdim)
    mask_o = lane >= 3 * hdim
    # tanh(x) = 2*sigmoid(2x) - 1: scale the g quarter by 2, then remap
    sc_in = jnp.where(mask_g, 2.0, 1.0)
    sc_a = jnp.where(mask_g, 2.0, 1.0)
    sc_b = jnp.where(mask_g, -1.0, 0.0)

    def body(j, _):
        i = tc - 1 - j
        s = (nt - 1 - t) * tc + i
        dg_p = dgp_scr[:]
        for l in range(num_layers):
            valid = jnp.logical_and(s >= l, s < l + t_real)
            gates = gs_ref[:, l, i]
            c_prev = csp_ref[:, l, i]

            if l == num_layers - 1:
                dy = dys_ref[:, i]
            elif no_dy:
                dy = dg_p[:, l + 1, :hdim] * 0.5
            else:
                dy = jax.lax.dot_general(
                    dg_p[:, l + 1].astype(wih_ref.dtype),
                    wih_ref[l],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dh = dy + dh_scr[:, l]

            if preacts:
                # forward-stored wide residuals: gs slot carries
                # A = [ii, ff, gg, oo]; csp slot (4H-wide in this mode)
                # carries M = [gg, c_prev, ii, tanh_c] — the backward
                # chain is ~11 wide ops, zero transcendentals
                A = gates  # repurposed input
                M = c_prev  # repurposed input, (B, 4H)
                tanh_c = M[:, 3 * hdim:]
                oo = A[:, 3 * hdim:]
                ff = A[:, hdim : 2 * hdim]
                dc = (
                    dh * oo * (1.0 - tanh_c * tanh_c) + dc_scr[:, l]
                )
                dc_prev = dc * ff
                dstack = jnp.where(mask_o, _tile4(dh), _tile4(dc))
                u = dstack * M
                a2 = A * A
                d_act = jnp.where(mask_g, 1.0 - a2, A - a2)
                dgates = u * d_act
            elif no_deriv:
                # passthrough with a cheap broadcast dependence on dh —
                # keeps the slot-serial chain intact while ablating the
                # derivative chain and its 4-way lane concat
                dgates = gates * 1e-3 + dh[:, :1] * 1e-6
                dc_prev = dh * 0.5 + dc_scr[:, l]
            else:
                if wide_transc:
                    # one wide sigmoid covers all four quarters:
                    # tanh(x) = 2*sigmoid(2x) - 1 handled by the
                    # per-quarter scale/remap rows
                    A = jax.nn.sigmoid(gates * sc_in) * sc_a + sc_b
                    ii = A[:, :hdim]
                    ff = A[:, hdim : 2 * hdim]
                    gg = A[:, 2 * hdim : 3 * hdim]
                    oo = A[:, 3 * hdim :]
                else:
                    ii, ff, gg, oo = _acts(gates, hdim, cheap_act)
                c = ff * c_prev + ii * gg
                tanh_c = c * 0.5 if cheap_act else jnp.tanh(c)
                do = dh * tanh_c
                dc = dh * oo * (1.0 - tanh_c * tanh_c) + dc_scr[:, l]
                di = dc * gg
                df = dc * c_prev
                dg = dc * ii
                dc_prev = dc * ff
                dgates = jnp.concatenate(
                    [
                        di * ii * (1.0 - ii),
                        df * ff * (1.0 - ff),
                        dg * (1.0 - gg * gg),
                        do * oo * (1.0 - oo),
                    ],
                    axis=-1,
                )
            dgates = jnp.where(valid, dgates, 0.0)
            dgc_scr[:, l, i] = dgates
            dgp_scr[:, l] = dgates
            if no_dh:
                dh_prev = dgates[:, :hdim] * 0.5
            else:
                dh_prev = jax.lax.dot_general(
                    dgates.astype(whh_ref.dtype),
                    whh_ref[l],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dh_scr[:, l] = jnp.where(valid, dh_prev, dh_scr[:, l])
            dc_scr[:, l] = jnp.where(valid, dc_prev, dc_scr[:, l])
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    if not no_acc:
        mm = wih_ref.dtype
        dgc = dgc_scr[:]
        hspc = hsp_ref[:]
        for l in range(num_layers):
            a = hspc[:, l].reshape(b * tc, hdim).astype(mm)
            g_l = dgc[:, l].reshape(b * tc, 4 * hdim).astype(mm)
            dwhh_ref[l] += jax.lax.dot_general(
                a, g_l,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if l < num_layers - 1:
                g_up = dgc[:, l + 1].reshape(b * tc, 4 * hdim)
                dwih_ref[l] += jax.lax.dot_general(
                    a, g_up.astype(mm),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                db_ref[l] += jnp.sum(g_up, axis=0)
    dg0_ref[:] = dgc_scr[:, 0]

    @pl.when(t == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def make_bwd(t_real, num_layers, **abl):
    def bwd(gs, csp, hsp, dys_slot, w_ih_t, w_hh_t, dhn, dcn):
        b, _, s_pad, g4 = gs.shape
        h = g4 // 4
        csp_d = csp.shape[-1]  # h normally, 4h in preacts mode
        nt = s_pad // CHUNK_S
        rev4 = lambda d: pl.BlockSpec(
            (b, num_layers, CHUNK_S, d),
            lambda t: (0, 0, nt - 1 - t, 0),
            memory_space=pltpu.VMEM,
        )
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
                _bwd_kernel_probe, t_real=t_real, num_layers=num_layers,
                **abl,
            ),
            grid=(nt,),
            in_specs=[
                rev4(g4), rev4(csp_d), rev4(h),
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, nt - 1 - t, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(w_ih_t.shape), full(w_hh_t.shape), state, state,
            ],
            out_specs=(
                pl.BlockSpec(
                    (b, CHUNK_S, g4), lambda t: (0, nt - 1 - t, 0),
                    memory_space=pltpu.VMEM,
                ),
                state, state,
                full((num_layers, h, g4)),
                full((num_layers - 1, h, g4)),
                full((num_layers - 1, g4)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s_pad, g4), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h, g4), jnp.float32),
                jax.ShapeDtypeStruct((num_layers - 1, h, g4), jnp.float32),
                jax.ShapeDtypeStruct((num_layers - 1, g4), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM((b, num_layers, h), jnp.float32),
                pltpu.VMEM((b, num_layers, h), jnp.float32),
                pltpu.VMEM((b, num_layers, g4), jnp.float32),
                pltpu.VMEM((b, num_layers, CHUNK_S, g4), jnp.float32),
            ],
        )(gs, csp, hsp, dys_slot, w_ih_t, w_hh_t, dhn, dcn)

    return bwd


def time_fn(fn, args, n_small=2, n_large=6, estimates=3):
    out = fn(*args)
    jax.block_until_ready(out)

    def run(n, out):
        a = args
        t0 = time.perf_counter()
        for i in range(n):
            eps = jnp.tanh(out[1].ravel()[0]) * 1e-3 + i * 1e-4
            a = (a[0] + eps,) + a[1:]
            out = fn(*a)
        float(jnp.asarray(out[1]).ravel()[0])
        return time.perf_counter() - t0, out

    _, out = run(1, out)
    slopes = []
    for _ in range(estimates):
        t_s, out = run(n_small, out)
        t_l, out = run(n_large, out)
        s = (t_l - t_s) / (n_large - n_small)
        if s > 0:
            slopes.append(s)
    if not bool(jnp.isfinite(out[1]).all()):
        print(
            "WARNING: non-finite dh0 — measurement discarded "
            "(content-memoization hazard)",
            file=sys.stderr,
        )
        return None
    return float(np.median(slopes)) * 1e3 if slopes else None


def main():
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
    s_pad = _slot_pad_len(t, L)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    gs = jax.random.normal(ks[0], (b, L, s_pad, 4 * h)) * 0.5
    csp = jax.random.normal(ks[1], (b, L, s_pad, h)) * 0.5
    hsp = jax.random.normal(ks[2], (b, L, s_pad, h)) * 0.5
    dys = jax.random.normal(ks[3], (b, s_pad, h)) * 0.1
    w_ih_t = (jax.random.normal(ks[4], (L - 1, h, 4 * h)) * 0.05).astype(wdt)
    w_hh_t = (jax.random.normal(ks[5], (L, h, 4 * h)) * 0.05).astype(wdt)
    dhn = jax.random.normal(ks[6], (b, L, h)) * 0.1
    dcn = jax.random.normal(ks[7], (b, L, h)) * 0.1
    inp = (gs, csp, hsp, dys, w_ih_t, w_hh_t, dhn, dcn)

    record = {
        "metric": "stacked_kernel_bwd_ablation_ms",
        "shape": f"B{b} x T{t}, L{L} x H{h}, weights {args.dtype}",
    }
    base = dict(cheap_act=False, no_deriv=False, no_dy=False,
                no_dh=False, no_acc=False)
    variants = [
        ("full", {}),
        ("noact", {"cheap_act": True}),
        ("noderiv", {"no_deriv": True}),
        ("nody", {"no_dy": True}),
        ("nodh", {"no_dh": True}),
        ("noacc", {"no_acc": True}),
        ("skeleton", {"cheap_act": True, "no_deriv": True}),
        # numerics-preserving redesigns (candidate production kernels):
        ("widetransc", {"wide_transc": True}),
        ("preacts", {"preacts": True}),
    ]
    # preacts repurposes csp as the 4H-wide M = [gg, c_prev, ii, tanh_c]
    csp4 = jax.random.uniform(ks[1], (b, L, s_pad, 4 * h)) * 0.5
    acts = jax.random.uniform(ks[0], (b, L, s_pad, 4 * h))
    for name, over in variants:
        fn = jax.jit(make_bwd(t, L, **{**base, **over}))
        args_v = inp
        if name == "preacts":
            args_v = (acts, csp4) + inp[2:]
        ms = time_fn(fn, args_v)
        record[name + "_ms"] = None if ms is None else round(ms, 2)
        print(f"{name}: {record[name + '_ms']} ms", file=sys.stderr)
    full = record.get("full_ms")
    if full is not None:
        for name, _ in variants[1:]:
            v = record.get(name + "_ms")
            if v is not None:
                record[name.replace("no", "", 1) + "_cost_ms"] = round(
                    full - v, 2
                )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
