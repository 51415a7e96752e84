"""Pallas TPU kernel: fused LSTM recurrence (forward + BPTT backward).

XLA's lax.scan LSTM costs ~3 us/step in launch/layout overhead while the
recurrent matmul itself is ~0.2 us at these sizes (h @ W_hh for B<=128,
H=256) — >90% overhead on the audio encoder's 1000+-step sequences, the
dominant cost of metaformer training. This kernel runs the entire
recurrence in one program: h/c live in VMEM scratch across grid steps,
the precomputed input projections (x @ W_ih + biases) stream from HBM in
time chunks (Pallas double-buffers grid inputs automatically), and every
step is a single MXU matmul plus fused VPU gate math.

Grid = (T_pad / chunk,), sequential on one core — scratch persistence and
reverse-order backward streaming are the supported TPU patterns.

The backward is split by data dependence: the vjp-forward saves the
gate pre-activation trajectory it already computes (replacing xw in the
residuals — same size, zero extra memory), and dW_hh reduces OUTSIDE
the kernel as ONE (H, B·T) x (B·T, 4H) einsum over the kernel's dgates
output at full MXU efficiency. The backward kernel streams
gates/c-trajectory/dys in reverse time chunks and performs only the
truly sequential work per step: VPU gate math and a single
dgates @ W_hh^T matmul for the dh chain. (The original design did 3
small M=32 matmuls per step in-kernel; at these shapes the chain is
issue-latency-bound, so hoisting the gate recompute and dW out is worth
~2x on the whole backward.)

Numerics: torch gate order (i, f, g, o), f32 state. Matches the scan
path to ~1e-5 (tests/test_pallas_lstm.py); exposed via
TorchLSTM(impl="pallas") for unidirectional layers.

Mixed precision: the dtype of w_hh_t selects the MXU matmul precision.
With bf16 weights every recurrent matmul runs bf16 x bf16 -> f32 (full
MXU rate; f32 operands cost a multi-pass decomposition), while h/c
state, gate math, and the dW accumulator stay f32 — strictly better
numerics than a bf16-carry scan. At B32/H256 the f32 matmuls are the
dominant per-step cost (M=32 underutilizes the MXU rows, so the step is
issue-bound on matmul passes), which is why bf16 train steps barely won
before this path existed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_T = 16  # time-pad quantum: the MAX chunk, so padded shapes are
# batch-independent — chunk_t(b) only picks the BLOCKING. Under
# custom_partitioning the abstract eval sees the global batch and the
# lowering the local shard; any output shape keyed on chunk_t(batch)
# would disagree between the two (multi-chip compile failure).

# raise the kernel's scoped-VMEM cap above the 16 MB compiler
# default: chunk buffers scale with batch x chunk and B>=64 at
# H256 overflows the default even at shrunken chunks (v5e has
# 128 MB physical VMEM; 64 MB leaves the pipeline headroom)
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024
)


def _fwd_kernel(
    xw_ref, whh_ref, h0_ref, c0_ref,
    ys_ref, cs_ref, hn_ref, cn_ref,
    h_scr, c_scr,
    *, t_real, gs_ref=None,
):
    """gs_ref (present on the vjp-fwd variant) saves the per-step gate
    pre-activations as a trajectory so the backward never recomputes
    them — it replaces xw in the autodiff residuals (same size)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = xw_ref.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    def body(i, _):
        # chunk-padding steps (beyond the real T) must not evolve state,
        # so hn/cn come out as the state at t_real
        valid = t * tc + i < t_real
        # whh's dtype selects matmul precision (bf16 = full MXU rate);
        # accumulation and state stay f32
        gates = xw_ref[:, i] + jnp.dot(
            h_scr[:].astype(whh_ref.dtype), whh_ref[:],
            preferred_element_type=jnp.float32,
        )
        if gs_ref is not None:
            gs_ref[:, i] = gates
        hdim = h_scr.shape[-1]
        ii = jax.nn.sigmoid(gates[:, :hdim])
        ff = jax.nn.sigmoid(gates[:, hdim : 2 * hdim])
        gg = jnp.tanh(gates[:, 2 * hdim : 3 * hdim])
        oo = jax.nn.sigmoid(gates[:, 3 * hdim :])
        c = ff * c_scr[:] + ii * gg
        h = oo * jnp.tanh(c)
        h_scr[:] = jnp.where(valid, h, h_scr[:])
        c_scr[:] = jnp.where(valid, c, c_scr[:])
        ys_ref[:, i] = h
        cs_ref[:, i] = c
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        hn_ref[:] = h_scr[:]
        cn_ref[:] = c_scr[:]


def _fwd_kernel_savegates(
    xw_ref, whh_ref, h0_ref, c0_ref,
    ys_ref, cs_ref, hn_ref, cn_ref, gs_ref,
    h_scr, c_scr,
    *, t_real,
):
    _fwd_kernel(
        xw_ref, whh_ref, h0_ref, c0_ref,
        ys_ref, cs_ref, hn_ref, cn_ref,
        h_scr, c_scr,
        t_real=t_real, gs_ref=gs_ref,
    )


def _bwd_kernel(
    gates_ref, whh_ref, csp_ref, dys_ref,
    dhn_ref, dcn_ref,
    dxw_ref, dh0_ref, dc0_ref,
    dh_scr, dc_scr,
    *, t_real,
):
    """Reverse-streamed BPTT chain. Grid step t covers time chunk nt-1-t.

    gates are the PRE-ACTIVATIONS xw + h_{t-1} @ W_hh^T, recomputed for
    the whole sequence by one host-side einsum (h_{t-1} comes from the
    stored trajectory shifted right with h0 in slot 0). csp is the
    right-shifted c trajectory (c0 in slot 0). Final-state cotangents
    enter exactly by initializing the dh/dc scratch at t == 0. dW_hh is
    NOT accumulated here — it is an einsum over the dgates output
    (= dxw) outside, where the MXU can batch the whole sequence.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = gates_ref.shape[1]
    hdim = csp_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]

    whh_t = whh_ref[:]  # (H, 4H)

    def body(j, _):
        i = tc - 1 - j  # reverse within the chunk
        global_idx = (nt - 1 - t) * tc + i
        valid = global_idx < t_real
        gates = gates_ref[:, i]
        c_prev = csp_ref[:, i]

        ii = jax.nn.sigmoid(gates[:, :hdim])
        ff = jax.nn.sigmoid(gates[:, hdim : 2 * hdim])
        gg = jnp.tanh(gates[:, 2 * hdim : 3 * hdim])
        oo = jax.nn.sigmoid(gates[:, 3 * hdim :])
        # current c: un-shift — csp[:, i+1] == c_i except at the chunk's
        # last slot, where the next chunk holds it; recompute instead
        c = ff * c_prev + ii * gg
        tc_ = jnp.tanh(c)

        dh = dys_ref[:, i] + dh_scr[:]
        do = dh * tc_
        dc = dh * oo * (1.0 - tc_ * tc_) + dc_scr[:]
        di = dc * gg
        df = dc * c_prev
        dg = dc * ii
        dc_prev = dc * ff

        dgi = di * ii * (1.0 - ii)
        dgf = df * ff * (1.0 - ff)
        dgg = dg * (1.0 - gg * gg)
        dgo = do * oo * (1.0 - oo)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)  # (B, 4H)
        # chunk-padding steps contribute nothing and pass grads through
        dgates = jnp.where(valid, dgates, 0.0)

        dxw_ref[:, i] = dgates
        # the ONLY sequential matmul: the dh chain back one step
        dh_prev = jax.lax.dot_general(
            dgates.astype(whh_t.dtype), whh_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_scr[:] = jnp.where(valid, dh_prev, dh_scr[:])
        dc_scr[:] = jnp.where(valid, dc_prev, dc_scr[:])
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


from multimodalreactiongeneration_tpu.ops.partitioning import (
    chunk_t as _chunk_t,
    pad_time as _pad_time,
)


def _fwd_common(xw, w_hh_t, h0, c0, save_gates):
    """xw (B, T, 4H) = x @ W_ih^T + b_ih + b_hh;  w_hh_t (H, 4H).

    save_gates=True (vjp-fwd path) additionally writes the gate
    pre-activation trajectory (B, T_pad, 4H) for the backward."""
    tc = _chunk_t(xw.shape[0])
    xw_p, t_real = _pad_time(xw, PAD_T)  # batch-independent pad; tc | PAD_T
    b, t_pad, g4 = xw_p.shape
    h = g4 // 4
    nt = t_pad // tc

    chunk_spec = lambda d: pl.BlockSpec(
        (b, tc, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec((b, h), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)
    out_specs = [chunk_spec(h), chunk_spec(h), state_spec, state_spec]
    out_shape = [
        jax.ShapeDtypeStruct((b, t_pad, h), jnp.float32),
        jax.ShapeDtypeStruct((b, t_pad, h), jnp.float32),
        jax.ShapeDtypeStruct((b, h), jnp.float32),
        jax.ShapeDtypeStruct((b, h), jnp.float32),
    ]
    kernel = _fwd_kernel
    if save_gates:
        kernel = _fwd_kernel_savegates
        out_specs.append(chunk_spec(g4))
        out_shape.append(jax.ShapeDtypeStruct((b, t_pad, g4), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(kernel, t_real=t_real),
        grid=(nt,),
        in_specs=[
            chunk_spec(g4),
            pl.BlockSpec((h, g4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=_COMPILER_PARAMS,
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
    )(xw_p, w_hh_t, h0, c0)
    ys, cs, hn, cn = outs[:4]
    if save_gates:
        # gates stay padded — the bwd kernel consumes the padded layout
        return ys[:, :t_real], cs[:, :t_real], hn, cn, outs[4]
    return ys[:, :t_real], cs[:, :t_real], hn, cn


def _fwd_impl(xw, w_hh_t, h0, c0):
    """Positional-only (custom_partitioning traces keyword defaults)."""
    return _fwd_common(xw, w_hh_t, h0, c0, False)


def _fwd_impl_savegates(xw, w_hh_t, h0, c0):
    return _fwd_common(xw, w_hh_t, h0, c0, True)


def _bwd_impl(w_hh_t, h0, c0, ys, cs, gates_all, dys, dhn, dcn):
    tc = _chunk_t(ys.shape[0])  # local blocking; shapes use PAD_T
    ys_p, t_real = _pad_time(ys, PAD_T)
    cs_p, _ = _pad_time(cs, PAD_T)
    dys_p, _ = _pad_time(dys, PAD_T)
    b, t_pad, g4 = gates_all.shape  # gates come in PADDED from vjp-fwd
    h = g4 // 4
    nt = t_pad // tc
    rev = lambda t: (0, nt - 1 - t, 0)
    mm = w_hh_t.dtype  # bf16 weights -> bf16 matmuls, f32 accumulate

    # trajectories shifted one step right with the TRUE initial state in
    # slot 0: index i then reads h_{global-1}/c_{global-1} everywhere
    ys_shift = jnp.concatenate([h0[:, None], ys_p[:, :-1]], axis=1)
    cs_shift = jnp.concatenate([c0[:, None], cs_p[:, :-1]], axis=1)

    dxw, dh0_out, dc0_out = pl.pallas_call(
        functools.partial(_bwd_kernel, t_real=t_real),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, tc, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, tc, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, g4), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
    )(gates_all, w_hh_t, cs_shift, dys_p, dhn, dcn)

    # dW_hh = sum_t h_{t-1}^T dgates_t: one einsum over the whole
    # sequence (contraction dim B*T fills the MXU; padding steps are
    # zeroed in dxw by the kernel's valid mask).
    # Precision.HIGHEST is REQUIRED in f32 mode: XLA's default TPU
    # matmul precision truncates f32 operands to single-pass bf16, and
    # this contraction's heavy cancellation amplified that to 5-15%
    # relative dW_hh error on-chip at T>=100 (measured round 5;
    # interpret-mode CPU tests can't see it). No-op for bf16 operands.
    dwhh = jnp.einsum(
        "bth,btg->hg", ys_shift.astype(mm), dxw.astype(mm),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(w_hh_t.dtype)
    return dxw[:, :t_real], dwhh, dh0_out, dc0_out


# SPMD: each device runs the kernel on its local batch shard; weights
# replicated; dwhh (a sum over batch) is psum'd in the lowering
# (ops/partitioning.py). Without this GSPMD cannot place the Mosaic
# custom call under a sharded mesh.
from multimodalreactiongeneration_tpu.ops.partitioning import (  # noqa: E402
    shard_batch_dim,
)

_fwd_sharded = shard_batch_dim(
    _fwd_impl, batch_args=(0, 2, 3),
    out_is_batched=(True, True, True, True),
    sharding_rule="b t g, h g, b h, b h -> b t h, b t h, b h, b h",
)
_fwd_sharded_savegates = shard_batch_dim(
    _fwd_impl_savegates, batch_args=(0, 2, 3),
    out_is_batched=(True, True, True, True, True),
    # 's' not 't' for the gates output: it stays PAD_T-padded, so its
    # time size differs from t whenever T % PAD_T != 0
    sharding_rule="b t g, h g, b h, b h -> b t h, b t h, b h, b h, b s g",
)
_bwd_sharded = shard_batch_dim(
    _bwd_impl, batch_args=(1, 2, 3, 4, 5, 6, 7, 8),
    out_is_batched=(True, False, True, True),
    reduce_outs=(1,),
    sharding_rule=(
        "h g, b h, b h, b t h, b t h, b s g, b t h, b h, b h "
        "-> b t g, h g, b h, b h"
    ),
)


# ---------------------------------------------------------------------------
# Fully-fused layer op (round 5): wide-form backward + in-kernel dX/dW/db
# ---------------------------------------------------------------------------
#
# The round-5 train-step profile (B32 x T240 metaformer, bf16) showed
# the per-layer backward splitting into 11.2 ms of reverse-chain kernels
# PLUS 11.6 ms of OUTSIDE-kernel consumers of the dgates trajectory:
# dW_ih/dW_hh einsums (8.2 ms of dot_general) and bias-grad reduce_sums
# (3.4 ms) — each re-reading the (B, T, 4H) trajectory from HBM. The
# ``lstm_layer`` op moves the custom_vjp boundary UP to include the
# input projection, so the backward kernel can consume dgates entirely
# in VMEM: per reverse chunk it runs the serial chain (wide-form over
# stored A/M residuals, zero transcendentals — same redesign as
# ops/pallas_lstm_stacked.py), then emits dx = dgates @ W_ih (the only
# trajectory-sized output, 4x smaller than dgates) and accumulates
# dW_ih += x^T dgates, dW_hh += h_prev^T dgates, db += sum(dgates) into
# constant-index output blocks at full MXU contraction width (B*TC).
# The dgates trajectory never touches HBM.


def _fwd_kernel_acts(
    xw_ref, whh_ref, h0_ref, c0_ref,
    ys_ref, as_ref, ms_ref, hn_ref, cn_ref,
    h_scr, c_scr,
    *, t_real,
):
    """Forward storing the wide backward residuals A = [i, f, g, o] and
    M = [g, c_prev, i, tanh(c)] instead of gate pre-activations.
    Cell math identical to _fwd_kernel; c_prev is captured BEFORE the
    state update so index i reads c_{t-1} with c0 at each layer start
    (the shift the old path built with a host-side concat)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = xw_ref.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    def body(i, _):
        valid = t * tc + i < t_real
        gates = xw_ref[:, i] + jnp.dot(
            h_scr[:].astype(whh_ref.dtype), whh_ref[:],
            preferred_element_type=jnp.float32,
        )
        hdim = h_scr.shape[-1]
        ii = jax.nn.sigmoid(gates[:, :hdim])
        ff = jax.nn.sigmoid(gates[:, hdim : 2 * hdim])
        gg = jnp.tanh(gates[:, 2 * hdim : 3 * hdim])
        oo = jax.nn.sigmoid(gates[:, 3 * hdim :])
        c_prev = c_scr[:]
        c = ff * c_prev + ii * gg
        tanh_c = jnp.tanh(c)
        h = oo * tanh_c
        h_scr[:] = jnp.where(valid, h, h_scr[:])
        c_scr[:] = jnp.where(valid, c, c_prev)
        ys_ref[:, i] = h
        # lane-sliced quarter stores (a 4-way lane concat here measured
        # ~1 ms/fwd at T=1920 on the stacked kernel)
        as_ref[:, i, :hdim] = ii
        as_ref[:, i, hdim : 2 * hdim] = ff
        as_ref[:, i, 2 * hdim : 3 * hdim] = gg
        as_ref[:, i, 3 * hdim :] = oo
        ms_ref[:, i, :hdim] = gg
        ms_ref[:, i, hdim : 2 * hdim] = c_prev
        ms_ref[:, i, 2 * hdim : 3 * hdim] = ii
        ms_ref[:, i, 3 * hdim :] = tanh_c
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        hn_ref[:] = h_scr[:]
        cn_ref[:] = c_scr[:]


def _bwd_kernel_layer(
    as_ref, ms_ref, ysp_ref, x_ref, dys_ref, wih_ref, whh_ref,
    dhn_ref, dcn_ref,
    dx_ref, dh0_ref, dc0_ref, dwih_ref, dwhh_ref, db_ref,
    dh_scr, dc_scr, dgc_scr,
    *, t_real,
):
    """Reverse chunks: wide-form serial chain, then batched chunk-level
    dx matmul + dW/db accumulation — nothing trajectory-sized leaves
    the kernel except dx (the true input cotangent)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = as_ref.shape[1]
    hdim = ysp_ref.shape[-1]
    b = as_ref.shape[0]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 4 * hdim), 1)
    mask_g = jnp.logical_and(lane >= 2 * hdim, lane < 3 * hdim)
    mask_o = lane >= 3 * hdim

    def body(j, _):
        i = tc - 1 - j
        valid = (nt - 1 - t) * tc + i < t_real
        acts = as_ref[:, i]  # A = [i, f, g, o]
        m = ms_ref[:, i]     # M = [g, c_prev, i, tanh_c]
        tanh_c = m[:, 3 * hdim :]
        ff = acts[:, hdim : 2 * hdim]
        oo = acts[:, 3 * hdim :]

        dh = dys_ref[:, i] + dh_scr[:]
        dc = dh * oo * (1.0 - tanh_c * tanh_c) + dc_scr[:]
        dc_prev = dc * ff
        dstack = jnp.where(
            mask_o,
            jnp.concatenate([dh, dh, dh, dh], axis=-1),
            jnp.concatenate([dc, dc, dc, dc], axis=-1),
        )
        u = dstack * m  # [dc*g, dc*c_prev, dc*i, dh*tanh_c]
        a2 = acts * acts
        d_act = jnp.where(mask_g, 1.0 - a2, acts - a2)
        dgates = jnp.where(valid, u * d_act, 0.0)
        dgc_scr[:, i] = dgates
        dh_prev = jax.lax.dot_general(
            dgates.astype(whh_ref.dtype), whh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_scr[:] = jnp.where(valid, dh_prev, dh_scr[:])
        dc_scr[:] = jnp.where(valid, dc_prev, dc_scr[:])
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    # chunk-level trailing work at full MXU contraction width (B*TC);
    # these matmuls have no serial dependence across the chunk
    mm = wih_ref.dtype
    din = x_ref.shape[-1]
    dgc = dgc_scr[:].reshape(b * tc, 4 * hdim)
    dx_ref[:] = jax.lax.dot_general(
        dgc.astype(mm), wih_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, tc, din)
    xc = x_ref[:].reshape(b * tc, din)
    dwih_ref[:] += jax.lax.dot_general(
        xc.astype(mm), dgc.astype(mm),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ysc = ysp_ref[:].reshape(b * tc, hdim)
    dwhh_ref[:] += jax.lax.dot_general(
        ysc.astype(mm), dgc.astype(mm),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[0] += jnp.sum(dgc_scr[:], axis=(0, 1))

    @pl.when(t == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _fwd_acts_impl(xw, w_hh_t, h0, c0):
    """Forward with (ys, A, M) residuals, all PAD_T-padded (the bwd
    kernel consumes the padded layout)."""
    tc = _chunk_t(xw.shape[0])
    xw_p, t_real = _pad_time(xw, PAD_T)
    b, t_pad, g4 = xw_p.shape
    h = g4 // 4
    nt = t_pad // tc

    chunk_spec = lambda d: pl.BlockSpec(
        (b, tc, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec((b, h), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)
    ys, as_, ms, hn, cn = pl.pallas_call(
        functools.partial(_fwd_kernel_acts, t_real=t_real),
        grid=(nt,),
        in_specs=[
            chunk_spec(g4),
            pl.BlockSpec((h, g4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_specs=(chunk_spec(h), chunk_spec(g4), chunk_spec(g4),
                   state_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, g4), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, g4), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
    )(xw_p, w_hh_t, h0, c0)
    return ys, as_, ms, hn, cn


def _bwd_layer_impl(w_ih_t, w_hh_t, ysp, x_p, as_, ms, dys, dhn, dcn):
    tc = _chunk_t(ysp.shape[0])
    b, t_pad, g4 = as_.shape
    h = g4 // 4
    din = x_p.shape[-1]
    nt = t_pad // tc
    rev = lambda t: (0, nt - 1 - t, 0)
    chunk = lambda d: pl.BlockSpec((b, tc, d), rev,
                                   memory_space=pltpu.VMEM)
    state = pl.BlockSpec((b, h), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    t_real = dys.shape[1]
    dys_p, _ = _pad_time(dys, PAD_T)
    dx, dh0, dc0, dwih, dwhh, db = pl.pallas_call(
        functools.partial(_bwd_kernel_layer, t_real=t_real),
        grid=(nt,),
        in_specs=[
            chunk(g4), chunk(g4), chunk(h), chunk(din), chunk(h),
            full(w_ih_t.shape), full(w_hh_t.shape), state, state,
        ],
        out_specs=(
            chunk(din), state, state,
            full((din, g4)), full((h, g4)), full((1, g4)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, din), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((din, g4), jnp.float32),
            jax.ShapeDtypeStruct((h, g4), jnp.float32),
            jax.ShapeDtypeStruct((1, g4), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, tc, g4), jnp.float32),
        ],
    )(as_, ms, ysp, x_p, dys_p, w_ih_t, w_hh_t, dhn, dcn)
    return dx[:, :t_real], dh0, dc0, dwih, dwhh, db[0]


_fwd_acts_sharded = shard_batch_dim(
    _fwd_acts_impl, batch_args=(0, 2, 3),
    out_is_batched=(True, True, True, True, True),
    # 's' for every trajectory: they stay PAD_T-padded
    sharding_rule="b t g, h g, b h, b h -> b s h, b s g, b s g, b h, b h",
)
_bwd_layer_sharded = shard_batch_dim(
    _bwd_layer_impl, batch_args=(2, 3, 4, 5, 6, 7, 8),
    out_is_batched=(True, True, True, False, False, False),
    reduce_outs=(3, 4, 5),
    sharding_rule=(
        "i g, h g, b s h, b s i, b s g, b s g, b t h, b h, b h "
        "-> b t i, b h, b h, i g, h g, g"
    ),
)


@jax.custom_vjp
def lstm_layer(x, w_ih_t, b_sum, w_hh_t, h0, c0):
    """One fused LSTM layer: input projection + recurrence, with the
    fully-fused backward described above.

    x:      (B, T, din) float32 (callers cast)
    w_ih_t: (din, 4H) = W_ih^T; dtype selects MXU matmul precision
    b_sum:  (4H,) = b_ih + b_hh, float32
    w_hh_t: (H, 4H)
    h0, c0: (B, H) float32
    Returns (ys (B, T, H), (h_n, c_n)).
    """
    xw = (
        jnp.einsum(
            "bti,ig->btg", x, w_ih_t, preferred_element_type=jnp.float32
        )
        + b_sum
    ).astype(jnp.float32)
    ys, _, hn, cn = _fwd_sharded(xw, w_hh_t, h0, c0)
    return ys, (hn, cn)


def _layer_vjp_fwd(x, w_ih_t, b_sum, w_hh_t, h0, c0):
    xw = (
        jnp.einsum(
            "bti,ig->btg", x, w_ih_t, preferred_element_type=jnp.float32
        )
        + b_sum
    ).astype(jnp.float32)
    ys, as_, ms, hn, cn = _fwd_acts_sharded(xw, w_hh_t, h0, c0)
    t = x.shape[1]
    out = (ys[:, :t], (hn, cn))
    return out, (x, w_ih_t, w_hh_t, h0, c0, ys, as_, ms)


def _layer_vjp_bwd(res, cot):
    x, w_ih_t, w_hh_t, h0, c0, ys_p, as_, ms = res
    dys, (dhn, dcn) = cot
    # one-step-right-shifted h trajectory with h0 in slot 0
    ysp = jnp.concatenate([h0[:, None], ys_p[:, :-1]], axis=1)
    x_p, _ = _pad_time(x.astype(jnp.float32), PAD_T)
    dx, dh0, dc0, dwih, dwhh, db = _bwd_layer_sharded(
        w_ih_t, w_hh_t, ysp, x_p, as_, ms,
        dys.astype(jnp.float32),
        dhn.astype(jnp.float32), dcn.astype(jnp.float32),
    )
    return (
        dx.astype(x.dtype),
        dwih.astype(w_ih_t.dtype),
        db,
        dwhh.astype(w_hh_t.dtype),
        dh0,
        dc0,
    )


lstm_layer.defvjp(_layer_vjp_fwd, _layer_vjp_bwd)


@jax.custom_vjp
def lstm_recurrence(xw, w_hh_t, h0, c0):
    """Fused LSTM over precomputed input projections.

    xw: (B, T, 4H) = x @ W_ih^T + b_ih + b_hh (torch gate order i,f,g,o)
    w_hh_t: (H, 4H) = W_hh^T      h0, c0: (B, H)
    Returns (ys (B, T, H), (h_n, c_n)).
    """
    ys, _, hn, cn = _fwd_sharded(xw, w_hh_t, h0, c0)
    return ys, (hn, cn)


def _vjp_fwd(xw, w_hh_t, h0, c0):
    # the vjp-fwd variant saves the gate trajectory (replacing xw in the
    # residuals, same size) so the backward never recomputes it
    ys, cs, hn, cn, gates = _fwd_sharded_savegates(xw, w_hh_t, h0, c0)
    return (ys, (hn, cn)), (w_hh_t, h0, c0, ys, cs, gates)


def _vjp_bwd(res, cot):
    w_hh_t, h0, c0, ys, cs, gates = res
    dys, (dhn, dcn) = cot
    dxw, dwhh, dh0, dc0 = _bwd_sharded(
        w_hh_t, h0, c0, ys, cs, gates, dys, dhn, dcn
    )
    return dxw, dwhh, dh0, dc0


lstm_recurrence.defvjp(_vjp_fwd, _vjp_bwd)
