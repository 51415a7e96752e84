"""Pallas TPU kernel: multi-layer LSTM stack as a single WAVEFRONT.

The metaformer's modality encoders are plain stacked LSTMs —
``TorchLSTM(num_layers=5)`` with no dropout between layers (reference
nn.LSTM inside the mixer, mixer_block.py:194-246; encoder_num_layer=5,
lstmformer/config.yaml:44). Run layer-by-layer (ops/pallas_lstm.py per
layer), the sequential dependence chain is ``L x T`` cell updates — at
~1 us per update that chain, not FLOPs, is the ceiling of the whole
train step (the audio encoder alone is 5 x 1920 sequential steps).

This kernel runs the stack as a wavefront: one fused program advances a
diagonal front where layer ``l`` processes time ``t = s - l`` at
wavefront slot ``s``. All L cell updates of a slot depend only on the
previous slot (layer l consumes h_{l-1} computed one slot earlier), so
they are mutually independent: per slot the kernel issues 2L
independent MXU matmuls (input + recurrent projections) whose latencies
overlap, and the sequential chain shrinks from ``L x T`` to
``T + L - 1`` slots — ~5x fewer for the 5-layer encoders.

Trajectories are stored SLOT-indexed: layer ``l``'s data for time ``t``
lives at slot ``s = t + l``, so every layer reads/writes the same block
row per slot (no per-layer misaligned chunking). Invalid slots
(``s < l`` or ``s >= l + T``) carry the layer's frozen state, which
makes the one-slot-shifted trajectories the backward needs correct at
every layer's first step.

The backward runs the same wavefront in reverse: per slot, layer ``l``'s
dh chain receives (a) its own next-step cotangent, and (b) layer
``l+1``'s dgates from the PREVIOUS reverse slot through W_ih_{l+1} —
again L independent updates per slot. Two round-5 redesigns, both
selected by ``MRGEN_FUSED_DW`` (default on; ``=0`` restores the round-4
path for A/B):

1. **Fused weight gradients.** Per grid chunk the dgates stay in a VMEM
   scratch, and dW_hh / dW_ih / db accumulate into constant-index
   output blocks via chunk-level MXU matmuls whose contraction dim is
   B*CHUNK_S (full MXU K). Only layer 0's dgates leave the kernel (the
   xw0 cotangent); the (B, L, S, 4H) dgates trajectory — ~1.3 GB of
   HBM round-trip at the audio encoder's T=1920 — is never
   materialized. (Measured neutral on its own: the trajectory DMA was
   already hidden by the slot-serial chain; kept because it composes
   with redesign 2 and halves residual reads.)

2. **Wide-form derivative chain over stored activations.** The round-5
   ablation probe (benchmarks/stacked_bwd_probe.py) measured the
   backward's per-slot VPU derivative chain — activation recompute,
   ~20 quarter-width ops, and a 4-way lane concat — at ~9.5 ms of the
   21 ms isolated backward (B32 x T1920 x L5). The forward therefore
   stores two wide residuals per slot-layer instead of gate
   pre-activations: ``A = [i, f, g, o]`` (post-activations) and
   ``M = [g, c_prev, i, tanh(c)]``. The backward chain collapses to
   ~11 full-width ops with ZERO transcendentals:
   ``u = where(mask_o, dh, dc)_tiled * M``;
   ``d_act = where(mask_g, 1-A^2, A-A^2)``; ``dgates = u * d_act`` —
   measured 21.1 -> 14.7 ms isolated. Invalid-slot rows still
   contribute zero because dgates is masked in-kernel.

Numerics: torch gate order (i, f, g, o), f32 state and accumulation;
the dtype of w_hh_t/w_ih_t selects MXU matmul precision (bf16 weights =
full-rate bf16 matmuls). Matches the layer-by-layer scan stack to ~1e-5
(tests/test_pallas_lstm_stacked.py). Wired into TorchLSTM for
unidirectional multi-layer stacks with inactive dropout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slot chunk: 8 is the Mosaic floor (second-minor block dim must divide
# by 8); the wavefront carries L layers of chunk buffers so it stays at
# the floor and relies on the raised scoped-VMEM cap instead
CHUNK_S = 8

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024
)


def _split_gates(gates, h):
    ii = jax.nn.sigmoid(gates[:, :h])
    ff = jax.nn.sigmoid(gates[:, h : 2 * h])
    gg = jnp.tanh(gates[:, 2 * h : 3 * h])
    oo = jax.nn.sigmoid(gates[:, 3 * h :])
    return ii, ff, gg, oo


def _fwd_kernel(
    xw0_ref, wih_ref, b_ref, whh_ref, h0_ref, c0_ref,
    hs_ref, cs_ref, gs_ref, hn_ref, cn_ref,
    h_scr, c_scr,
    *, t_real, num_layers,
):
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
        # snapshot: every layer's input is the PREVIOUS slot's h of the
        # layer below — reads must not see this slot's updates
        h_prev = h_scr[:]  # (B, L, H)
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
            ii, ff, gg, oo = _split_gates(gates, hdim)
            c = ff * c_scr[:, l] + ii * gg
            h = oo * jnp.tanh(c)
            valid = jnp.logical_and(s >= l, s < l + t_real)
            # store the MASKED state: invalid slots carry the frozen
            # h/c, which makes the backward's one-slot-shifted
            # trajectories read h0/c0 at each layer's first valid step
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


def _fwd_kernel_acts(
    xw0_ref, wih_ref, b_ref, whh_ref, h0_ref, c0_ref,
    hs_ref, as_ref, ms_ref, hn_ref, cn_ref,
    h_scr, c_scr,
    *, t_real, num_layers,
):
    """Forward wavefront storing the wide backward residuals
    ``A = [i, f, g, o]`` and ``M = [g, c_prev, i, tanh(c)]`` instead of
    gate pre-activations (redesign 2 in the module docstring). Cell
    math is identical to ``_fwd_kernel``; only the residual layout
    differs (c_prev is captured BEFORE the state update, so each
    layer's first valid step carries c0 — the shift the old path built
    with a host-side concat)."""
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
        h_prev = h_scr[:]  # (B, L, H) snapshot (see _fwd_kernel)
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
            ii, ff, gg, oo = _split_gates(gates, hdim)
            c_prev = c_scr[:, l]
            c = ff * c_prev + ii * gg
            tanh_c = jnp.tanh(c)
            h = oo * tanh_c
            valid = jnp.logical_and(s >= l, s < l + t_real)
            h_new = jnp.where(valid, h, h_prev[:, l])
            c_new = jnp.where(valid, c, c_prev)
            h_scr[:, l] = h_new
            c_scr[:, l] = c_new
            hs_ref[:, l, i] = h_new
            # lane-sliced quarter stores, NOT a concat: assembling the
            # wide rows in vregs first measured ~5 ms/fwd at T=1920
            # (two 4-way lane concats per slot-layer) — the quarters
            # are already separate values, so write them in place
            as_ref[:, l, i, :hdim] = ii
            as_ref[:, l, i, hdim : 2 * hdim] = ff
            as_ref[:, l, i, 2 * hdim : 3 * hdim] = gg
            as_ref[:, l, i, 3 * hdim :] = oo
            ms_ref[:, l, i, :hdim] = gg
            ms_ref[:, l, i, hdim : 2 * hdim] = c_prev
            ms_ref[:, l, i, 2 * hdim : 3 * hdim] = ii
            ms_ref[:, l, i, 3 * hdim :] = tanh_c
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        hn_ref[:] = h_scr[:]
        cn_ref[:] = c_scr[:]


def _bwd_kernel(
    gs_ref, csp_ref, dys_ref, wih_ref, whh_ref, dhn_ref, dcn_ref,
    dgs_ref, dh0_ref, dc0_ref,
    dh_scr, dc_scr, dgp_scr,
    *, t_real, num_layers,
):
    """Reverse wavefront. Grid step t covers slot chunk nt-1-t.

    csp is the one-slot-right-shifted c trajectory (c0 rows in slot 0).
    dys is the top layer's output cotangent scattered into slot space
    (zeros elsewhere). Final-state cotangents enter by initializing the
    scratches — invalid slots pass them through untouched until each
    layer's last valid step, exactly like the single-layer kernel.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = gs_ref.shape[2]
    hdim = csp_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]
        dgp_scr[:] = jnp.zeros_like(dgp_scr)

    def body(j, _):
        i = tc - 1 - j
        s = (nt - 1 - t) * tc + i
        # snapshot: layer l reads layer l+1's dgates from slot s+1 (the
        # previous reverse step), not the values written this step
        dg_p = dgp_scr[:]  # (B, L, 4H)
        for l in range(num_layers):
            valid = jnp.logical_and(s >= l, s < l + t_real)
            gates = gs_ref[:, l, i]
            c_prev = csp_ref[:, l, i]
            ii, ff, gg, oo = _split_gates(gates, hdim)
            c = ff * c_prev + ii * gg
            tanh_c = jnp.tanh(c)

            if l == num_layers - 1:
                dy = dys_ref[:, i]
            else:
                # h_{l,t} fed layer l+1 at the SAME time t = slot s+1
                dy = jax.lax.dot_general(
                    dg_p[:, l + 1].astype(wih_ref.dtype),
                    wih_ref[l],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dh = dy + dh_scr[:, l]
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
            dgs_ref[:, l, i] = dgates
            dgp_scr[:, l] = dgates
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

    @pl.when(t == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _bwd_kernel_fused(
    as_ref, ms_ref, hsp_ref, dys_ref, wih_ref, whh_ref, dhn_ref, dcn_ref,
    dg0_ref, dh0_ref, dc0_ref, dwhh_ref, dwih_ref, db_ref,
    dh_scr, dc_scr, dgp_scr, dgc_scr,
    *, t_real, num_layers,
):
    """Reverse wavefront: wide-form derivative chain + in-kernel dW.

    Consumes the ``_fwd_kernel_acts`` residuals A/M. Per slot-layer the
    dgates computation is ~11 full-width VPU ops with no
    transcendentals (see module docstring, redesign 2):

      dc      = dh*o*(1-tanh_c^2) + dc_carry      (quarter-width)
      u       = [dc, dc, dc, dh] * M              = [di, df, dg, do]
      d_act   = A-A^2, except 1-A^2 on the g lane = act derivatives
      dgates  = u * d_act

    dgates land in the chunk scratch ``dgc_scr`` instead of an HBM
    trajectory. After each chunk's serial loop, dW_hh[l] +=
    hsp_chunk[l]^T @ dg_chunk[l] and dW_ih[l] += hsp_chunk[l]^T @
    dg_chunk[l+1] (layer l+1's input at slot s is layer l's shifted h
    at the SAME slot) run as (H, B*TC) x (B*TC, 4H) MXU matmuls into
    constant-index accumulator outputs; db[l] sums dg_chunk[l+1] over
    (B, TC). Only layer 0's dgates (the xw0 cotangent) are written
    back per chunk.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = as_ref.shape[2]
    hdim = hsp_ref.shape[-1]
    b = as_ref.shape[0]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]
        dgp_scr[:] = jnp.zeros_like(dgp_scr)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # per-quarter lane masks, built once per grid step from the lane
    # iota: mask_g marks the tanh (g) quarter, mask_o the output gate
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 4 * hdim), 1)
    mask_g = jnp.logical_and(lane >= 2 * hdim, lane < 3 * hdim)
    mask_o = lane >= 3 * hdim

    def body(j, _):
        i = tc - 1 - j
        s = (nt - 1 - t) * tc + i
        # snapshot: layer l reads layer l+1's dgates from slot s+1 (the
        # previous reverse step), not the values written this step
        dg_p = dgp_scr[:]  # (B, L, 4H)
        for l in range(num_layers):
            valid = jnp.logical_and(s >= l, s < l + t_real)
            acts = as_ref[:, l, i]  # A = [i, f, g, o]
            m = ms_ref[:, l, i]     # M = [g, c_prev, i, tanh_c]
            tanh_c = m[:, 3 * hdim :]
            ff = acts[:, hdim : 2 * hdim]
            oo = acts[:, 3 * hdim :]

            if l == num_layers - 1:
                dy = dys_ref[:, i]
            else:
                # h_{l,t} fed layer l+1 at the SAME time t = slot s+1
                dy = jax.lax.dot_general(
                    dg_p[:, l + 1].astype(wih_ref.dtype),
                    wih_ref[l],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dh = dy + dh_scr[:, l]
            dc = dh * oo * (1.0 - tanh_c * tanh_c) + dc_scr[:, l]
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
            dgc_scr[:, l, i] = dgates
            dgp_scr[:, l] = dgates
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

    # chunk-level weight-gradient accumulation: contraction over
    # (B, TC) = B*CHUNK_S rows fills the MXU's K dim, and these matmuls
    # have no serial dependence — they overlap the next chunk's chain
    mm = wih_ref.dtype
    dgc = dgc_scr[:]  # (B, L, TC, 4H) f32
    hspc = hsp_ref[:]  # (B, L, TC, H)
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
    dg0_ref[:] = dgc[:, 0]

    @pl.when(t == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _pad_slots(x, axis, s_pad):
    pad = s_pad - x.shape[axis]
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        x = jnp.pad(x, cfg)
    return x


def _make_fwd(t_real: int, acts: bool = False):
    """acts=False: store (hs, cs, gs) residuals (round-4 layout).
    acts=True: store (hs, A, M) residuals for the wide-form backward
    (A and M are 4H-wide where cs was H-wide)."""

    def fwd(xw0s, w_ih_t, b_rest, w_hh_t, h0, c0):
        b, s_pad, g4 = xw0s.shape
        num_layers = w_hh_t.shape[0]
        h = g4 // 4
        nt = s_pad // CHUNK_S

        chunk = lambda d: pl.BlockSpec(
            (b, num_layers, CHUNK_S, d),
            lambda t: (0, 0, t, 0),
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
        traj = lambda d: jax.ShapeDtypeStruct(
            (b, num_layers, s_pad, d), jnp.float32
        )
        kernel = _fwd_kernel_acts if acts else _fwd_kernel
        out_specs = (
            (chunk(h), chunk(g4), chunk(g4), state, state)
            if acts
            else (chunk(h), chunk(h), chunk(g4), state, state)
        )
        out_shape = (
            (traj(h), traj(g4), traj(g4))
            if acts
            else (traj(h), traj(h), traj(g4))
        ) + (
            jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
            jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
        )
        outs = pl.pallas_call(
            functools.partial(
                kernel, t_real=t_real, num_layers=num_layers
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
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM((b, num_layers, h), jnp.float32),
                pltpu.VMEM((b, num_layers, h), jnp.float32),
            ],
        )(xw0s, w_ih_t, b_rest, w_hh_t, h0, c0)
        return outs

    return fwd


def _make_bwd(t_real: int):
    def bwd(gs, csp, dys_slot, w_ih_t, w_hh_t, dhn, dcn):
        b, num_layers, s_pad, g4 = gs.shape
        h = g4 // 4
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
        dgs, dh0, dc0 = pl.pallas_call(
            functools.partial(
                _bwd_kernel, t_real=t_real, num_layers=num_layers
            ),
            grid=(nt,),
            in_specs=[
                rev4(g4),
                rev4(h),
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, nt - 1 - t, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(w_ih_t.shape),
                full(w_hh_t.shape),
                state,
                state,
            ],
            out_specs=(rev4(g4), state, state),
            out_shape=(
                jax.ShapeDtypeStruct((b, num_layers, s_pad, g4), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM((b, num_layers, h), jnp.float32),
                pltpu.VMEM((b, num_layers, h), jnp.float32),
                pltpu.VMEM((b, num_layers, g4), jnp.float32),
            ],
        )(gs, csp, dys_slot, w_ih_t, w_hh_t, dhn, dcn)
        return dgs, dh0, dc0

    return bwd


def _make_bwd_fused(t_real: int):
    def bwd(as_, ms, hsp, dys_slot, w_ih_t, w_hh_t, dhn, dcn):
        b, num_layers, s_pad, g4 = as_.shape
        h = g4 // 4
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
        dg0, dh0, dc0, dwhh, dwih, db = pl.pallas_call(
            functools.partial(
                _bwd_kernel_fused, t_real=t_real, num_layers=num_layers
            ),
            grid=(nt,),
            in_specs=[
                rev4(g4),
                rev4(g4),
                rev4(h),
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, nt - 1 - t, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(w_ih_t.shape),
                full(w_hh_t.shape),
                state,
                state,
            ],
            out_specs=(
                pl.BlockSpec(
                    (b, CHUNK_S, g4), lambda t: (0, nt - 1 - t, 0),
                    memory_space=pltpu.VMEM,
                ),
                state,
                state,
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
        )(as_, ms, hsp, dys_slot, w_ih_t, w_hh_t, dhn, dcn)
        return dg0, dh0, dc0, dwhh, dwih, db

    return bwd


from multimodalreactiongeneration_tpu.ops.partitioning import (  # noqa: E402
    shard_batch_dim,
)

# one partitioned callable per (T, residual layout) — cached so
# repeated tracing of the same sequence length reuses the
# custom_partitioning instance
@functools.lru_cache(maxsize=None)
def _fwd_sharded_for(t_real: int, acts: bool = False):
    # residual trajectories: (hs, cs, gs) or, acts=True, (hs, A, M)
    out_rule = (
        "b l s h, b l s g, b l s g, b l h, b l h"
        if acts
        else "b l s h, b l s h, b l s g, b l h, b l h"
    )
    return shard_batch_dim(
        _make_fwd(t_real, acts),
        batch_args=(0, 4, 5),
        out_is_batched=(True, True, True, True, True),
        sharding_rule=(
            "b s g, k h g, k g, l h g, b l h, b l h -> " + out_rule
        ),
    )


@functools.lru_cache(maxsize=None)
def _bwd_sharded_for(t_real: int):
    return shard_batch_dim(
        _make_bwd(t_real),
        batch_args=(0, 1, 2, 5, 6),
        out_is_batched=(True, True, True),
        sharding_rule=(
            "b l s g, b l s h, b s h, k h g, l h g, b l h, b l h "
            "-> b l s g, b l h, b l h"
        ),
    )


@functools.lru_cache(maxsize=None)
def _bwd_fused_sharded_for(t_real: int):
    # weight grads are batch sums -> psum'd over the batch mesh axis in
    # the partitioned lowering (reduce_outs), like pallas_lstm's dwhh
    return shard_batch_dim(
        _make_bwd_fused(t_real),
        batch_args=(0, 1, 2, 3, 6, 7),
        out_is_batched=(True, True, True, False, False, False),
        reduce_outs=(3, 4, 5),
        sharding_rule=(
            "b l s g, b l s g, b l s h, b s h, k h g, l h g, b l h, "
            "b l h -> b s g, b l h, b l h, l h g, k h g, k g"
        ),
    )


def _slot_pad_len(t: int, num_layers: int) -> int:
    s = t + num_layers - 1
    return s + (-s) % CHUNK_S


@jax.custom_vjp
def lstm_stacked_recurrence(xw0, w_ih_t, b_rest, w_hh_t, h0, c0):
    """Fused multi-layer LSTM wavefront over precomputed layer-0 inputs.

    xw0:     (B, T, 4H) = x @ W_ih_0^T + b_ih_0 + b_hh_0, float32
    w_ih_t:  (L-1, H, 4H) input projections of layers 1..L-1, transposed
             (dtype selects MXU matmul precision, like lstm_recurrence)
    b_rest:  (L-1, 4H) b_ih + b_hh of layers 1..L-1, float32
    w_hh_t:  (L, H, 4H)
    h0, c0:  (L, B, H) (torch state layout), float32
    Returns (ys_top (B, T, H), (h_n (L, B, H), c_n (L, B, H))).

    Callers pass f32 activations/biases/states (the TorchLSTM wrapper
    casts) — the custom_vjp returns f32 cotangents for them.
    """
    out, _res = _run_fwd(xw0, w_ih_t, b_rest, w_hh_t, h0, c0)
    return out


def _run_fwd(xw0, w_ih_t, b_rest, w_hh_t, h0, c0):
    b, t, g4 = xw0.shape
    num_layers = w_hh_t.shape[0]
    s_pad = _slot_pad_len(t, num_layers)
    xw0s = _pad_slots(xw0, 1, s_pad)
    h0b = jnp.swapaxes(h0, 0, 1)  # (B, L, H)
    c0b = jnp.swapaxes(c0, 0, 1)
    # residuals r1/r2 = (cs, gs) on the round-4 path, (A, M) on the
    # fused wide-form path — _vjp_bwd reads the same flag
    hs, r1, r2, hn, cn = _fwd_sharded_for(t, _fused_dw_enabled())(
        xw0s, w_ih_t, b_rest, w_hh_t, h0b, c0b
    )
    ys_top = hs[:, num_layers - 1, num_layers - 1 : num_layers - 1 + t]
    out = (ys_top, (jnp.swapaxes(hn, 0, 1), jnp.swapaxes(cn, 0, 1)))
    return out, (w_ih_t, w_hh_t, h0b, c0b, hs, r1, r2)


def _vjp_fwd(xw0, w_ih_t, b_rest, w_hh_t, h0, c0):
    return _run_fwd(xw0, w_ih_t, b_rest, w_hh_t, h0, c0)


def _fused_dw_enabled() -> bool:
    import os

    return os.environ.get("MRGEN_FUSED_DW", "1") != "0"


def _vjp_bwd(res, cot):
    w_ih_t, w_hh_t, h0b, c0b, hs, r1, r2 = res
    dys, (dhn, dcn) = cot
    t = dys.shape[1]  # the true T, statically from the cotangent aval
    b, num_layers, s_pad, h = hs.shape
    mm = w_hh_t.dtype  # bf16 weights -> bf16 reduction matmuls

    dys_slot = jnp.zeros((b, s_pad, h), jnp.float32)
    dys_slot = jax.lax.dynamic_update_slice(
        dys_slot, dys.astype(jnp.float32), (0, num_layers - 1, 0)
    )
    dhnb = jnp.swapaxes(dhn, 0, 1).astype(jnp.float32)
    dcnb = jnp.swapaxes(dcn, 0, 1).astype(jnp.float32)
    hsp = jnp.concatenate([h0b[:, :, None], hs[:, :, :-1]], axis=2)

    if _fused_dw_enabled():
        # round-5 path: wide-form chain over the stored A/M residuals;
        # dW/db accumulate inside the reverse wavefront and the
        # (B, L, S, 4H) dgates trajectory never touches HBM
        as_, ms = r1, r2
        dg0, dh0b, dc0b, dwhh, dwih, db = _bwd_fused_sharded_for(t)(
            as_, ms, hsp, dys_slot, w_ih_t, w_hh_t, dhnb, dcnb
        )
        return (
            dg0[:, :t],
            dwih.astype(w_ih_t.dtype),
            db,
            dwhh.astype(w_hh_t.dtype),
            jnp.swapaxes(dh0b, 0, 1),
            jnp.swapaxes(dc0b, 0, 1),
        )

    cs, gs = r1, r2
    csp = jnp.concatenate([c0b[:, :, None], cs[:, :, :-1]], axis=2)
    dgs, dh0b, dc0b = _bwd_sharded_for(t)(
        gs, csp, dys_slot, w_ih_t, w_hh_t, dhnb, dcnb
    )

    # weight/bias grads as full-sequence einsums (invalid slots carry
    # dgates == 0, so frozen-state trajectory rows contribute nothing).
    # Precision.HIGHEST: XLA's default TPU precision (single-pass bf16
    # operands) measured 5-15% relative dW_hh error on-chip at T>=100
    # in f32 mode (round 5 — the fused path is immune because Mosaic
    # in-kernel f32 dots are multi-pass); no-op for bf16 operands
    dwhh = jnp.einsum(
        "blsh,blsg->lhg", hsp.astype(mm), dgs.astype(mm),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(w_hh_t.dtype)
    # layer l >= 1 consumed h_{l-1,t}, which sits at slot t + l - 1 =
    # the shifted trajectory of the layer BELOW at layer l's slot
    dwih = jnp.einsum(
        "blsh,blsg->lhg",
        hsp[:, : num_layers - 1].astype(mm),
        dgs[:, 1:].astype(mm),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(w_ih_t.dtype)
    db = jnp.einsum("blsg->lg", dgs[:, 1:])
    dxw0 = dgs[:, 0, :t]
    return (
        dxw0,
        dwih,
        db,
        dwhh,
        jnp.swapaxes(dh0b, 0, 1),
        jnp.swapaxes(dc0b, 0, 1),
    )


lstm_stacked_recurrence.defvjp(_vjp_fwd, _vjp_bwd)
