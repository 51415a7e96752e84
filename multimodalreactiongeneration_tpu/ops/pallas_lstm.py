"""Pallas TPU kernel: fused LSTM recurrence (forward + BPTT backward).

XLA's lax.scan LSTM costs ~3 us/step in launch/layout overhead while the
recurrent matmul itself is ~0.2 us at these sizes (h @ W_hh for B<=128,
H=256) — >90% overhead on the audio encoder's 1000+-step sequences, the
dominant cost of metaformer training. This kernel runs the entire
recurrence in one program: h/c live in VMEM scratch across grid steps,
the precomputed input projections (x @ W_ih + biases) stream from HBM in
time chunks (Pallas double-buffers grid inputs automatically), and every
step is a single MXU matmul plus fused VPU gate math.

Grid = (T / CHUNK_T,), sequential on one core — scratch persistence and
reverse-order backward streaming are the supported TPU patterns.

The backward kernel re-streams xw and the stored (h, c) trajectories in
reverse, recomputes gate activations, and accumulates dW_hh in VMEM.

Numerics: torch gate order (i, f, g, o), f32 state. Matches the scan
path to ~1e-5 (tests/test_pallas_lstm.py); exposed via
TorchLSTM(impl="pallas") for unidirectional layers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_T = 16


def _fwd_kernel(
    xw_ref, whh_ref, h0_ref, c0_ref,
    ys_ref, cs_ref, hn_ref, cn_ref,
    h_scr, c_scr,
    *, t_real,
):
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
        gates = xw_ref[:, i] + jnp.dot(
            h_scr[:], whh_ref[:], preferred_element_type=jnp.float32
        )
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


def _bwd_kernel(
    xw_ref, whh_ref, h0_ref, c0_ref, ysp_ref, csp_ref, dys_ref,
    dhn_ref, dcn_ref,
    dxw_ref, dwhh_ref, dh0_ref, dc0_ref,
    dh_scr, dc_scr, dw_scr,
    *, t_real,
):
    """Reverse-streamed BPTT. Grid step t covers time chunk nt-1-t.

    ysp/csp are the trajectories SHIFTED RIGHT by one step (host wrapper),
    so chunk-local index i reads h_{global-1}/c_{global-1} directly; the
    true sequence start substitutes h0/c0. Final-state cotangents enter
    exactly by initializing the dh/dc scratch with them at t == 0.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = xw_ref.shape[1]
    hdim = h0_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]
        dw_scr[:] = jnp.zeros_like(dw_scr)

    whh_t = whh_ref[:]  # (H, 4H)

    def body(j, _):
        i = tc - 1 - j  # reverse within the chunk
        global_idx = (nt - 1 - t) * tc + i
        valid = global_idx < t_real
        first_global = jnp.logical_and(t == nt - 1, i == 0)
        h_prev = jnp.where(first_global, h0_ref[:], ysp_ref[:, i])
        c_prev = jnp.where(first_global, c0_ref[:], csp_ref[:, i])

        gates = xw_ref[:, i] + jnp.dot(
            h_prev, whh_t, preferred_element_type=jnp.float32
        )
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
        dw_scr[:] += jax.lax.dot_general(
            h_prev, dgates,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_prev = jax.lax.dot_general(
            dgates, whh_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_scr[:] = jnp.where(valid, dh_prev, dh_scr[:])
        dc_scr[:] = jnp.where(valid, dc_prev, dc_scr[:])
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        dwhh_ref[:] = dw_scr[:]
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


from multimodalreactiongeneration_tpu.ops.partitioning import (
    pad_time as _pad_time,
)


def _fwd_impl(xw, w_hh_t, h0, c0):
    """xw (B, T, 4H) = x @ W_ih^T + b_ih + b_hh;  w_hh_t (H, 4H)."""
    xw_p, t_real = _pad_time(xw, CHUNK_T)
    b, t_pad, g4 = xw_p.shape
    h = g4 // 4
    nt = t_pad // CHUNK_T

    ys, cs, hn, cn = pl.pallas_call(
        functools.partial(_fwd_kernel, t_real=t_real),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, CHUNK_T, g4), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, CHUNK_T, h), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, CHUNK_T, h), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
    )(xw_p, w_hh_t, h0, c0)
    return ys[:, :t_real], cs[:, :t_real], hn, cn


def _bwd_impl(xw, w_hh_t, h0, c0, ys, cs, dys, dhn, dcn):
    xw_p, t_real = _pad_time(xw, CHUNK_T)
    ys_p, _ = _pad_time(ys, CHUNK_T)
    cs_p, _ = _pad_time(cs, CHUNK_T)
    dys_p, _ = _pad_time(dys, CHUNK_T)
    b, t_pad, g4 = xw_p.shape
    h = g4 // 4
    nt = t_pad // CHUNK_T
    rev = lambda t: (0, nt - 1 - t, 0)

    # shift the stored trajectories one step right: chunk-local index i
    # then reads h_{global-1}/c_{global-1} (sequence start handled in-kernel)
    ys_shift = jnp.concatenate([jnp.zeros((b, 1, h)), ys_p[:, :-1]], axis=1)
    cs_shift = jnp.concatenate([jnp.zeros((b, 1, h)), cs_p[:, :-1]], axis=1)

    dxw, dwhh, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, t_real=t_real),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, CHUNK_T, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, CHUNK_T, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, CHUNK_T, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, CHUNK_T, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, CHUNK_T, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, g4), jnp.float32),
            jax.ShapeDtypeStruct((h, g4), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((h, g4), jnp.float32),
        ],
    )(xw_p, w_hh_t, h0, c0, ys_shift, cs_shift, dys_p, dhn, dcn)
    return dxw[:, :t_real], dwhh, dh0, dc0


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
_bwd_sharded = shard_batch_dim(
    _bwd_impl, batch_args=(0, 2, 3, 4, 5, 6, 7, 8),
    out_is_batched=(True, False, True, True),
    reduce_outs=(1,),
    sharding_rule=(
        "b t g, h g, b h, b h, b t h, b t h, b t h, b h, b h "
        "-> b t g, h g, b h, b h"
    ),
)


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
    ys, cs, hn, cn = _fwd_sharded(xw, w_hh_t, h0, c0)
    return (ys, (hn, cn)), (xw, w_hh_t, h0, c0, ys, cs)


def _vjp_bwd(res, cot):
    xw, w_hh_t, h0, c0, ys, cs = res
    dys, (dhn, dcn) = cot
    dxw, dwhh, dh0, dc0 = _bwd_sharded(
        xw, w_hh_t, h0, c0, ys, cs, dys, dhn, dcn
    )
    return dxw, dwhh, dh0, dc0


lstm_recurrence.defvjp(_vjp_fwd, _vjp_bwd)
