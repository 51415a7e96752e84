"""Pallas TPU kernel: a recurrent-mixer block STACK as one chunk-lag
wavefront.

The metaformer's modality encoders are ``RecurrentMixerLayerd`` stacks of
``encoder_num_layer`` blocks, each block being LSTM -> +x -> LayerNorm ->
Dense(H->H) -> +res -> LayerNorm (reference mixer_block.py:355-507 with
the production flags residual=True, residual_layer_norm=True,
nonlinearity=None; lstmformer/config.yaml:38-44). Run block-by-block,
each block is its own recurrence kernel separated by XLA FFN/LN ops: the
sequential chain is ``L x T`` cell updates plus 2L full (B, T, H) HBM
round-trips — ~35 ms of the 60 ms B32 x T240 train step.

Scheduling insight: only the LSTM CELL is inherently sequential; the
block tail (residual+LN+Dense+LN) is parallel across time. A plain
per-timestep wavefront (layer lag 1) puts the tail on the serial chain
at single-row VPU efficiency and measures SLOWER than the unfused
stack. This kernel instead lags each block by one K-step chunk
(K = CHUNK_S): per grid step it
  1. advances all L blocks' cells K sequential steps, each step one
     LAYER-BATCHED pair of matmuls (einsum over (B, L, H) x (L, H, 4H)
     — the only serial work), then
  2. runs the K-timestep tails of all L blocks as ONE batched
     (B, L, K, H) LN->Dense->LN pass at full VPU/MXU width, feeding
     block l+1's next-chunk cell inputs through VMEM scratch.
The sequential chain is ``T + (L-1)K`` cell steps with the tail cost
amortized K-fold, and no inter-block HBM round-trips.

Trajectories are stored slot-indexed with chunk lag: block ``l``'s time
``t`` lives at slot ``s = t + l*K``, so one grid index reads every
block's correct chunk. Invalid slots freeze h/c at the block state,
which makes the backward's one-slot-shifted c/h reads correct at every
block's first step.

The backward (REWRITTEN round 5) mirrors the schedule — batched
tail-bwd, then K reverse cell steps — with the round-5 kernel
techniques: the forward stores wide residuals ``A = [i, f, g, o]`` /
``M = [g, c_prev, i, tanh c]`` so the reverse cells are a shallow
wide-form derivative chain with ZERO transcendentals, and ALL nine
parameter gradients (W_ih/b_g/W_hh/W_ff/b_ff/LN scales+biases)
accumulate into constant-index output blocks per chunk at B*K
contraction width. dx0 is the only trajectory-sized output. The
round-3/4 design emitted the (B, L, S, 4H) dgates trajectory and
re-derived every parameter grad with a full-sequence recompute +
einsums outside the kernel (~12 ms at the audio-encoder shape) — that
is what made it lose the train step then.

Numerics: f32 state/accumulation; weight dtype selects MXU matmul
precision (bf16 weights = full-rate bf16 matmuls). Matches the unfused
module stack to ~1e-5 f32 incl. every gradient
(tests/test_pallas_mixer_stack.py).

MEASURED RESULTS (v5e): forward 5.6 ms fused vs 10.7 ms unfused at the
audio-encoder shape (1.9x, 2026-08-17 — inter-block HBM round-trips
and 4/5 of the cell-chain latency gone). Training with the round-3
backward LOST (43.2 vs 32.1 ms full step); with the round-5 backward
it WINS: B32 x T240 bf16 metaformer train step 48.7 ms unfused ->
42.9 ms fused (2026-08-21), so the wiring is DEFAULT-ON
(MRGEN_FUSED_ENCODER=0 reverts, RecurrentMixerLayerd._fused_stack).
Two earlier schedules measured worse and shaped this one: a lag-1
wavefront with per-timestep tails (90 ms full step vs 58 baseline —
single-row VPU tails on the chain) and a layer-batched-matmul variant
with per-step (B,L,H)<->(L,B,H) relayouts (83 ms — Mosaic vector
relayouts dominate at these sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_S = 8  # time chunk AND per-block lag
LN_EPS = 1e-5

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024
)


def _ln_fwd(r, scale, bias):
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (r - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(g, xhat, rstd, scale):
    """dL/dr for out = xhat * scale + bias (standard LN backward)."""
    gg = g * scale
    return rstd * (
        gg
        - jnp.mean(gg, axis=-1, keepdims=True)
        - xhat * jnp.mean(gg * xhat, axis=-1, keepdims=True)
    )


def _split_gates4(gates, h):
    """Split (..., 4H) gate pre-activations, torch order i,f,g,o."""
    ii = jax.nn.sigmoid(gates[..., :h])
    ff = jax.nn.sigmoid(gates[..., h : 2 * h])
    gg = jnp.tanh(gates[..., 2 * h : 3 * h])
    oo = jax.nn.sigmoid(gates[..., 3 * h :])
    return ii, ff, gg, oo


def _fwd_kernel(
    x0_ref, wih_ref, bg_ref, whh_ref, wff_ref, bff_ref,
    g1_ref, b1_ref, g2_ref, b2_ref, h0_ref, c0_ref,
    as_ref, ms_ref, hs_ref, os_ref, hn_ref, cn_ref,
    h_scr, c_scr, xin_scr,
    *, t_real, num_layers,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = x0_ref.shape[1]
    hdim = h_scr.shape[-1]
    L = num_layers

    @pl.when(t == 0)
    def _():
        for l in range(L):
            h_scr[l] = h0_ref[:, l]
            c_scr[l] = c0_ref[:, l]
        xin_scr[:] = jnp.zeros_like(xin_scr)

    # block 0 consumes this grid step's streamed x0 chunk directly
    xin_scr[0] = x0_ref[:]

    # ---- phase 1: K sequential cell steps, per-layer static ops ----
    # every access is layout-native: static layer index + traced k on
    # the proven ref pattern, no stacks/swaps in the hot loop (vector
    # relayouts per step measured 3-4x slower than the cells themselves)
    def cell(k, _):
        # slot s = t*tc + k; block l's local time = s - l*tc
        s = t * tc + k
        for l in range(L):
            x_l = xin_scr[l, :, k]  # (B, H)
            h_l = h_scr[l]
            gates = (
                jnp.dot(
                    x_l.astype(wih_ref.dtype), wih_ref[l],
                    preferred_element_type=jnp.float32,
                )
                + jnp.dot(
                    h_l.astype(whh_ref.dtype), whh_ref[l],
                    preferred_element_type=jnp.float32,
                )
                + bg_ref[l]
            )
            ii, ff, gg, oo = _split_gates4(gates, hdim)
            c_prev = c_scr[l]
            c = ff * c_prev + ii * gg
            tanh_c = jnp.tanh(c)
            rnn = oo * tanh_c
            tt = s - l * tc
            valid = jnp.logical_and(tt >= 0, tt < t_real)
            h_new = jnp.where(valid, rnn, h_l)
            c_new = jnp.where(valid, c, c_prev)
            h_scr[l] = h_new
            c_scr[l] = c_new
            hs_ref[:, l, k] = h_new
            # wide backward residuals (round 5): A = [i, f, g, o] and
            # M = [g, c_prev, i, tanh(c)] via lane-sliced quarter
            # stores (a lane concat here measured ~1 ms/fwd on the
            # stacked kernel); c_prev is pre-update, so each block's
            # first valid step reads c0 — the shift the old path built
            # with a host-side concat
            as_ref[:, l, k, :hdim] = ii
            as_ref[:, l, k, hdim : 2 * hdim] = ff
            as_ref[:, l, k, 2 * hdim : 3 * hdim] = gg
            as_ref[:, l, k, 3 * hdim :] = oo
            ms_ref[:, l, k, :hdim] = gg
            ms_ref[:, l, k, hdim : 2 * hdim] = c_prev
            ms_ref[:, l, k, 2 * hdim : 3 * hdim] = ii
            ms_ref[:, l, k, 3 * hdim :] = tanh_c
        return 0

    jax.lax.fori_loop(0, tc, cell, 0)

    # ---- phase 2: batched K-timestep block tails, (L, B, K, H) ----
    rnn_chunk = jnp.stack(
        [hs_ref[:, l] for l in range(L)], axis=0
    )  # frozen h == rnn at valid steps
    r1 = rnn_chunk + xin_scr[:]
    y, _, _ = _ln_fwd(
        r1, g1_ref[:][:, None, None], b1_ref[:][:, None, None]
    )
    z = (
        jax.lax.dot_general(
            y.astype(wff_ref.dtype), wff_ref[:],
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + bff_ref[:][:, None, None]
    )
    out, _, _ = _ln_fwd(
        z + y, g2_ref[:][:, None, None], b2_ref[:][:, None, None]
    )
    for l in range(L):
        os_ref[:, l] = out[l]
    # next grid step: block l+1's cell input = block l's tail output
    xin_scr[1:] = out[: L - 1]

    @pl.when(t == nt - 1)
    def _():
        for l in range(L):
            hn_ref[:, l] = h_scr[l]
            cn_ref[:, l] = c_scr[l]


def _fwd_kernel_light(
    x0_ref, wih_ref, bg_ref, whh_ref, wff_ref, bff_ref,
    g1_ref, b1_ref, g2_ref, b2_ref, h0_ref, c0_ref,
    os_ref, hn_ref, cn_ref,
    h_scr, c_scr, xin_scr, rnn_scr,
    *, t_real, num_layers,
):
    """Inference forward: NO residual trajectories, top-block output
    only. The full variant writes A/M/h trajectories — 2.3 GB/HBM per
    batch-16 decode-length generation that autodiff alone needs; the
    primal (decode's hoisted encoder pass, eval sweeps) must not pay
    it. Cell h values stage through a VMEM scratch instead of an
    output ref; inter-block chunk staging already lived in xin_scr."""
    t = pl.program_id(0)
    tc = x0_ref.shape[1]
    hdim = h_scr.shape[-1]
    L = num_layers
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        for l in range(L):
            h_scr[l] = h0_ref[:, l]
            c_scr[l] = c0_ref[:, l]
        xin_scr[:] = jnp.zeros_like(xin_scr)

    xin_scr[0] = x0_ref[:]

    def cell(k, _):
        s = t * tc + k
        for l in range(L):
            x_l = xin_scr[l, :, k]
            h_l = h_scr[l]
            gates = (
                jnp.dot(
                    x_l.astype(wih_ref.dtype), wih_ref[l],
                    preferred_element_type=jnp.float32,
                )
                + jnp.dot(
                    h_l.astype(whh_ref.dtype), whh_ref[l],
                    preferred_element_type=jnp.float32,
                )
                + bg_ref[l]
            )
            ii, ff, gg, oo = _split_gates4(gates, hdim)
            c = ff * c_scr[l] + ii * gg
            rnn = oo * jnp.tanh(c)
            tt = s - l * tc
            valid = jnp.logical_and(tt >= 0, tt < t_real)
            h_new = jnp.where(valid, rnn, h_l)
            h_scr[l] = h_new
            c_scr[l] = jnp.where(valid, c, c_scr[l])
            rnn_scr[l, :, k] = h_new
        return 0

    jax.lax.fori_loop(0, tc, cell, 0)

    r1 = rnn_scr[:] + xin_scr[:]
    y, _, _ = _ln_fwd(
        r1, g1_ref[:][:, None, None], b1_ref[:][:, None, None]
    )
    z = (
        jax.lax.dot_general(
            y.astype(wff_ref.dtype), wff_ref[:],
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + bff_ref[:][:, None, None]
    )
    out, _, _ = _ln_fwd(
        z + y, g2_ref[:][:, None, None], b2_ref[:][:, None, None]
    )
    os_ref[:] = out[L - 1]
    xin_scr[1:] = out[: L - 1]

    @pl.when(t == nt - 1)
    def _():
        for l in range(L):
            hn_ref[:, l] = h_scr[l]
            cn_ref[:, l] = c_scr[l]


def _bwd_kernel(
    as_ref, ms_ref, hsp_ref, hs_ref, xs_ref, dys_ref,
    wih_ref, whh_ref, wff_ref, bff_ref, g1_ref, b1_ref, g2_ref,
    dhn_ref, dcn_ref,
    dx0_ref, dh0_ref, dc0_ref,
    dwih_ref, dbg_ref, dwhh_ref, dwff_ref, dbff_ref,
    dg1_ref, db1_ref, dg2_ref, db2_ref,
    dh_scr, dc_scr, dx_scr, dr1_scr, dgc_scr,
    *, t_real, num_layers,
):
    """Reverse chunk-lag wavefront, fully fused (round-5 rewrite).

    Streams the wide A/M residuals, the one-slot-shifted h trajectory
    (for dW_hh), the h trajectory (tail recompute) and xs (block
    inputs). Per grid step: batched tail-bwd at (L, B, K, H) width, K
    reverse WIDE-FORM cell steps (zero transcendentals — A/M carry the
    activations), then the batched dx chunk for the block below. Every
    weight/bias/LN gradient accumulates into constant-index output
    blocks per chunk (contraction width B*K), so nothing
    trajectory-sized leaves the kernel except dx0 — the round-4 design
    emitted the (B, L, S, 4H) dgates trajectory and re-derived all nine
    parameter grads with a full-sequence recompute + einsums outside
    (~12 ms at the audio-encoder shape).
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = as_ref.shape[2]
    hdim = hs_ref.shape[-1]
    b = as_ref.shape[0]
    L = num_layers

    @pl.when(t == 0)
    def _():
        for l in range(L):
            dh_scr[l] = dhn_ref[:, l]
            dc_scr[l] = dcn_ref[:, l]
        dx_scr[:] = jnp.zeros_like(dx_scr)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dwff_ref[:] = jnp.zeros_like(dwff_ref)
        dbff_ref[:] = jnp.zeros_like(dbff_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    g = nt - 1 - t  # forward grid index of this chunk

    # ---- phase 1: batched tail backward, (L, B, K, H) layout ----
    rnn_chunk = jnp.stack([hs_ref[:, l] for l in range(L)], axis=0)
    x_chunk = jnp.stack([xs_ref[:, l] for l in range(L)], axis=0)
    r1 = rnn_chunk + x_chunk
    y, xhat1, rstd1 = _ln_fwd(
        r1, g1_ref[:][:, None, None], b1_ref[:][:, None, None]
    )
    z = (
        jax.lax.dot_general(
            y.astype(wff_ref.dtype), wff_ref[:],
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + bff_ref[:][:, None, None]
    )
    r2 = z + y
    mu2 = jnp.mean(r2, axis=-1, keepdims=True)
    var2 = jnp.mean(r2 * r2, axis=-1, keepdims=True) - mu2 * mu2
    rstd2 = jax.lax.rsqrt(var2 + LN_EPS)
    xhat2 = (r2 - mu2) * rstd2

    # dout: top block from the output cotangent; others from the block
    # above's dx of the PREVIOUS reverse grid step (same time chunk)
    dout = jnp.concatenate([dx_scr[1:], dys_ref[:][None]], axis=0)
    dr2 = _ln_bwd(dout, xhat2, rstd2, g2_ref[:][:, None, None])
    dy = (
        jax.lax.dot_general(
            dr2.astype(wff_ref.dtype), wff_ref[:],
            dimension_numbers=(((3,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + dr2
    )
    dr1 = _ln_bwd(dy, xhat1, rstd1, g1_ref[:][:, None, None])
    # stage dr1 through scratch: the cell loop needs per-step slices
    # and Mosaic TC cannot dynamic_slice an array value
    dr1_scr[:] = dr1

    # tail parameter grads, accumulated per chunk (dout/dy are zero at
    # invalid slots by construction of the dx/dys chains)
    mm = wff_ref.dtype
    y2 = y.reshape(L, b * tc, hdim)
    dr2_2 = dr2.reshape(L, b * tc, hdim)
    dwff_ref[:] += jax.lax.dot_general(
        y2.astype(mm), dr2_2.astype(mm),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dbff_ref[:] += jnp.sum(dr2, axis=(1, 2))
    dg2_ref[:] += jnp.sum(dout * xhat2, axis=(1, 2))
    db2_ref[:] += jnp.sum(dout, axis=(1, 2))
    dg1_ref[:] += jnp.sum(dy * xhat1, axis=(1, 2))
    db1_ref[:] += jnp.sum(dy, axis=(1, 2))

    # per-quarter lane masks for the wide-form cell chain
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 4 * hdim), 1)
    mask_g = jnp.logical_and(lane >= 2 * hdim, lane < 3 * hdim)
    mask_o = lane >= 3 * hdim

    # ---- phase 2: K reverse WIDE-FORM cell steps ----
    def cell(j, _):
        k = tc - 1 - j
        s = g * tc + k
        for l in range(L):
            acts = as_ref[:, l, k]  # A = [i, f, g, o]
            m = ms_ref[:, l, k]     # M = [g, c_prev, i, tanh_c]
            tanh_c = m[:, 3 * hdim :]
            ff = acts[:, hdim : 2 * hdim]
            oo = acts[:, 3 * hdim :]
            drnn = dr1_scr[l, :, k] + dh_scr[l]
            dc = drnn * oo * (1.0 - tanh_c * tanh_c) + dc_scr[l]
            dc_prev = dc * ff
            dstack = jnp.where(
                mask_o,
                jnp.concatenate([drnn, drnn, drnn, drnn], axis=-1),
                jnp.concatenate([dc, dc, dc, dc], axis=-1),
            )
            u = dstack * m
            a2 = acts * acts
            d_act = jnp.where(mask_g, 1.0 - a2, acts - a2)
            tt = s - l * tc
            valid = jnp.logical_and(tt >= 0, tt < t_real)
            dgates = jnp.where(valid, u * d_act, 0.0)
            dgc_scr[l, :, k] = dgates
            dh_prev = jax.lax.dot_general(
                dgates.astype(whh_ref.dtype), whh_ref[l],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_scr[l] = jnp.where(valid, dh_prev, dh_scr[l])
            dc_scr[l] = jnp.where(valid, dc_prev, dc_scr[l])
        return 0

    jax.lax.fori_loop(0, tc, cell, 0)

    # ---- phase 3: batched dx chunk for the block below + dW ----
    dg_chunk = dgc_scr[:]  # (L, B, K, 4H)
    dx = (
        jax.lax.dot_general(
            dg_chunk.astype(wih_ref.dtype), wih_ref[:],
            dimension_numbers=(((3,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + dr1_scr[:]
    )
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tc, 1), 2)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1, 1), 0)
    tt = g * tc + kidx - lidx * tc
    dx_scr[:] = jnp.where(
        jnp.logical_and(tt >= 0, tt < t_real), dx, 0.0
    )
    dx0_ref[:] = dx_scr[0]

    # LSTM weight grads at B*K contraction width (invalid slots carry
    # dgates == 0, so frozen/garbage trajectory rows contribute zero)
    mmr = wih_ref.dtype
    dg2d = dg_chunk.reshape(L, b * tc, 4 * hdim)
    x2d = x_chunk.reshape(L, b * tc, hdim)
    hsp_chunk = jnp.stack([hsp_ref[:, l] for l in range(L)], axis=0)
    hsp2d = hsp_chunk.reshape(L, b * tc, hdim)
    dwih_ref[:] += jax.lax.dot_general(
        x2d.astype(mmr), dg2d.astype(mmr),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dwhh_ref[:] += jax.lax.dot_general(
        hsp2d.astype(mmr), dg2d.astype(mmr),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dbg_ref[:] += jnp.sum(dg_chunk, axis=(1, 2))

    @pl.when(t == nt - 1)
    def _():
        for l in range(L):
            dh0_ref[:, l] = dh_scr[l]
            dc0_ref[:, l] = dc_scr[l]


from multimodalreactiongeneration_tpu.ops.partitioning import (  # noqa: E402
    pad_axis as _pad_slots,
    slot_pad_len,
)


def _slot_pad_len(t: int, num_layers: int) -> int:
    return slot_pad_len(t, num_layers, CHUNK_S, lag=CHUNK_S)


def _make_fwd(t_real: int):
    def fwd(x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0, c0):
        b, s_pad, h = x0s.shape
        num_layers = w_hh_t.shape[0]
        g4 = 4 * h
        nt = s_pad // CHUNK_S
        chunk = lambda d: pl.BlockSpec(
            (b, num_layers, CHUNK_S, d), lambda t: (0, 0, t, 0),
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
                _fwd_kernel, t_real=t_real, num_layers=num_layers
            ),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, t, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(w_ih_t.shape), full(b_g.shape), full(w_hh_t.shape),
                full(w_ff.shape), full(b_ff.shape),
                full(g1.shape), full(b1.shape),
                full(g2.shape), full(b2.shape),
                state, state,
            ],
            out_specs=(chunk(g4), chunk(g4), chunk(h), chunk(h), state,
                       state),
            out_shape=(
                jax.ShapeDtypeStruct((b, num_layers, s_pad, g4), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, s_pad, g4), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, s_pad, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, s_pad, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM((num_layers, b, h), jnp.float32),
                pltpu.VMEM((num_layers, b, h), jnp.float32),
                pltpu.VMEM((num_layers, b, CHUNK_S, h), jnp.float32),
            ],
        )(x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0, c0)

    return fwd


def _make_fwd_light(t_real: int):
    def fwd(x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0, c0):
        b, s_pad, h = x0s.shape
        num_layers = w_hh_t.shape[0]
        nt = s_pad // CHUNK_S
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
                _fwd_kernel_light, t_real=t_real, num_layers=num_layers
            ),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, t, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(w_ih_t.shape), full(b_g.shape), full(w_hh_t.shape),
                full(w_ff.shape), full(b_ff.shape),
                full(g1.shape), full(b1.shape),
                full(g2.shape), full(b2.shape),
                state, state,
            ],
            out_specs=(
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, t, 0),
                    memory_space=pltpu.VMEM,
                ),
                state, state,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s_pad, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM((num_layers, b, h), jnp.float32),
                pltpu.VMEM((num_layers, b, h), jnp.float32),
                pltpu.VMEM((num_layers, b, CHUNK_S, h), jnp.float32),
                pltpu.VMEM((num_layers, b, CHUNK_S, h), jnp.float32),
            ],
        )(x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0, c0)

    return fwd


def _make_bwd(t_real: int):
    def bwd(as_, ms, hsp, hs, xs, dys, w_ih_t, w_hh_t, w_ff, b_ff,
            g1, b1, g2, dhn, dcn):
        b, num_layers, s_pad, g4 = as_.shape
        h = g4 // 4
        nt = s_pad // CHUNK_S
        rev = lambda d: pl.BlockSpec(
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
                _bwd_kernel, t_real=t_real, num_layers=num_layers
            ),
            grid=(nt,),
            in_specs=[
                rev(g4), rev(g4), rev(h), rev(h), rev(h),
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, nt - 1 - t, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(w_ih_t.shape), full(w_hh_t.shape), full(w_ff.shape),
                full(b_ff.shape), full(g1.shape), full(b1.shape),
                full(g2.shape),
                state, state,
            ],
            out_specs=(
                pl.BlockSpec(
                    (b, CHUNK_S, h), lambda t: (0, nt - 1 - t, 0),
                    memory_space=pltpu.VMEM,
                ),
                state, state,
                full((num_layers, h, g4)), full((num_layers, g4)),
                full((num_layers, h, g4)), full((num_layers, h, h)),
                full((num_layers, h)), full((num_layers, h)),
                full((num_layers, h)), full((num_layers, h)),
                full((num_layers, h)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s_pad, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((b, num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h, g4), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, g4), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h, g4), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h, h), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h), jnp.float32),
                jax.ShapeDtypeStruct((num_layers, h), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM((num_layers, b, h), jnp.float32),
                pltpu.VMEM((num_layers, b, h), jnp.float32),
                pltpu.VMEM((num_layers, b, CHUNK_S, h), jnp.float32),
                pltpu.VMEM((num_layers, b, CHUNK_S, h), jnp.float32),
                pltpu.VMEM(
                    (num_layers, b, CHUNK_S, 4 * h), jnp.float32
                ),
            ],
        )(as_, ms, hsp, hs, xs, dys, w_ih_t, w_hh_t, w_ff, b_ff,
          g1, b1, g2, dhn, dcn)

    return bwd


from multimodalreactiongeneration_tpu.ops.partitioning import (  # noqa: E402
    shard_batch_dim,
)


@functools.lru_cache(maxsize=None)
def _fwd_sharded_for(t_real: int):
    return shard_batch_dim(
        _make_fwd(t_real),
        batch_args=(0, 10, 11),
        out_is_batched=(True,) * 6,
        sharding_rule=(
            "b s h, l h g, l g, l h g, l h i, l h, l h, l h, l h, l h, "
            "b l h, b l h "
            "-> b l s g, b l s g, b l s h, b l s h, b l h, b l h"
        ),
    )


@functools.lru_cache(maxsize=None)
def _fwd_light_sharded_for(t_real: int):
    return shard_batch_dim(
        _make_fwd_light(t_real),
        batch_args=(0, 10, 11),
        out_is_batched=(True, True, True),
        sharding_rule=(
            "b s h, l h g, l g, l h g, l h i, l h, l h, l h, l h, l h, "
            "b l h, b l h -> b s h, b l h, b l h"
        ),
    )


@functools.lru_cache(maxsize=None)
def _bwd_sharded_for(t_real: int):
    # the nine parameter grads are batch sums -> psum'd over the batch
    # mesh axis in the partitioned lowering
    return shard_batch_dim(
        _make_bwd(t_real),
        batch_args=(0, 1, 2, 3, 4, 5, 13, 14),
        out_is_batched=(True, True, True) + (False,) * 9,
        reduce_outs=tuple(range(3, 12)),
        sharding_rule=(
            "b l s g, b l s g, b l s h, b l s h, b l s h, b s h, "
            "l h g, l h g, l h i, l h, l h, l h, l h, b l h, b l h "
            "-> b s h, b l h, b l h, l h g, l g, l h g, l h i, l h, "
            "l h, l h, l h, l h"
        ),
    )


@jax.custom_vjp
def mixer_stack_recurrence(
    x0, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0, c0
):
    """Fused L-block recurrent-mixer stack (see module docstring).

    x0:      (B, T, H) stack input, float32
    w_ih_t:  (L, H, 4H) per-block LSTM input weights, transposed (dtype
             selects MXU matmul precision)
    b_g:     (L, 4H) b_ih + b_hh per block, float32
    w_hh_t:  (L, H, 4H)
    w_ff:    (L, H, H) per-block Dense kernels ((in, out) flax layout)
    b_ff:    (L, H)
    g1/b1:   (L, H) mixer_norm scale/bias;  g2/b2: feed_forward LN
    h0, c0:  (L, B, H) per-block LSTM states, float32
    Returns (out_top (B, T, H), (h_n (L, B, H), c_n (L, B, H))).
    """
    # primal: the light kernel — no A/M/h residual trajectories (the
    # full variant's are autodiff-only and cost ~2.3 GB of HBM writes
    # per batch-16 decode-length generation), top-block output only
    b, t, h = x0.shape
    num_layers = w_hh_t.shape[0]
    s_pad = _slot_pad_len(t, num_layers)
    x0s = _pad_slots(x0, 1, s_pad)
    os_top, hn, cn = _fwd_light_sharded_for(t)(
        x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2,
        jnp.swapaxes(h0, 0, 1), jnp.swapaxes(c0, 0, 1),
    )
    off = (num_layers - 1) * CHUNK_S
    return os_top[:, off : off + t], (
        jnp.swapaxes(hn, 0, 1), jnp.swapaxes(cn, 0, 1),
    )


def _run_fwd(x0, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0, c0):
    b, t, h = x0.shape
    num_layers = w_hh_t.shape[0]
    s_pad = _slot_pad_len(t, num_layers)
    x0s = _pad_slots(x0, 1, s_pad)
    h0b = jnp.swapaxes(h0, 0, 1)
    c0b = jnp.swapaxes(c0, 0, 1)
    as_, ms, hs, os_, hn, cn = _fwd_sharded_for(t)(
        x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0b, c0b
    )
    off = (num_layers - 1) * CHUNK_S
    out_top = os_[:, num_layers - 1, off : off + t]
    out = (out_top, (jnp.swapaxes(hn, 0, 1), jnp.swapaxes(cn, 0, 1)))
    res = (x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2,
           h0b, c0b, as_, ms, hs, os_)
    return out, res


def _vjp_fwd(x0, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2, h0, c0):
    return _run_fwd(x0, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2,
                    h0, c0)


def _vjp_bwd(res, cot):
    (x0s, w_ih_t, b_g, w_hh_t, w_ff, b_ff, g1, b1, g2, b2,
     h0b, c0b, as_, ms, hs, os_) = res
    dout_top, (dhn, dcn) = cot
    t = dout_top.shape[1]
    b, num_layers, s_pad, h = hs.shape
    K = CHUNK_S
    f32 = jnp.float32

    # block inputs per slot: block 0 reads x0 (t == s), block l reads
    # block l-1's output K slots earlier (the chunk lag)
    below = os_[:, : num_layers - 1]
    below = jnp.concatenate(
        [jnp.zeros((b, num_layers - 1, K, h), f32), below[:, :, :-K]],
        axis=2,
    )
    xs = jnp.concatenate([x0s[:, None], below], axis=1)
    hsp = jnp.concatenate([h0b[:, :, None], hs[:, :, :-1]], axis=2)

    off = (num_layers - 1) * K
    dys_slot = jnp.zeros((b, s_pad, h), f32)
    dys_slot = jax.lax.dynamic_update_slice(
        dys_slot, dout_top.astype(f32), (0, off, 0)
    )

    (dx0s, dh0b, dc0b, dwih, dbg, dwhh, dwff, dbff,
     dg1, db1, dg2, db2) = _bwd_sharded_for(t)(
        as_, ms, hsp, hs, xs, dys_slot,
        w_ih_t, w_hh_t, w_ff, b_ff, g1, b1, g2,
        jnp.swapaxes(dhn, 0, 1).astype(f32),
        jnp.swapaxes(dcn, 0, 1).astype(f32),
    )
    return (
        dx0s[:, :t],
        dwih.astype(w_ih_t.dtype),
        dbg,
        dwhh.astype(w_hh_t.dtype),
        dwff.astype(w_ff.dtype),
        dbff,
        dg1,
        db1,
        dg2,
        db2,
        jnp.swapaxes(dh0b, 0, 1),
        jnp.swapaxes(dc0b, 0, 1),
    )



mixer_stack_recurrence.defvjp(_vjp_fwd, _vjp_bwd)
