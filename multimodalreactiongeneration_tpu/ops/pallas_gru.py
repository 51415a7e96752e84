"""Pallas TPU kernel: fused GRU recurrence (forward + BPTT backward).

Twin of ops/pallas_lstm.py for the GRU mixer family (torch gate order
r, z, n with b_hn kept inside the reset product — nn/recurrent.py).
Same structure: h in VMEM scratch across sequential grid steps, input
projections streamed in time chunks, reverse-streamed backward with gate
recomputation and VMEM accumulation of dW_hh / db_hh.

xw = x @ W_ih^T + b_ih (B, T, 3H); hh = h @ W_hh^T + b_hh is computed
in-kernel because b_hn participates inside the reset gate product.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_T = 16  # batch-independent time-pad quantum (see pallas_lstm.py)

# raise the kernel's scoped-VMEM cap above the 16 MB compiler
# default: chunk buffers scale with batch x chunk and B>=64 at
# H256 overflows the default even at shrunken chunks (v5e has
# 128 MB physical VMEM; 64 MB leaves the pipeline headroom)
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024
)


def _gates(xw_t, h_prev, whh_t, b_hh, hdim):
    # whh's dtype selects matmul precision (bf16 = full MXU rate);
    # accumulation, bias add and gate math stay f32 (see pallas_lstm.py)
    hh = jnp.dot(
        h_prev.astype(whh_t.dtype), whh_t,
        preferred_element_type=jnp.float32,
    ) + b_hh
    r, z, n, hn = _gates_from_hh(xw_t, hh, hdim)
    return r, z, n, hn, hh


def _gates_from_hh(xw_t, hh, hdim):
    xr, xz, xn = (
        xw_t[:, :hdim],
        xw_t[:, hdim : 2 * hdim],
        xw_t[:, 2 * hdim :],
    )
    hr, hz, hn = hh[:, :hdim], hh[:, hdim : 2 * hdim], hh[:, 2 * hdim :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return r, z, n, hn


def _fwd_kernel(
    xw_ref, whh_ref, bhh_ref, h0_ref, ys_ref, hn_out_ref, h_scr,
    *, t_real, hhs_ref=None,
):
    """hhs_ref (vjp-fwd variant) saves hh = h_{t-1} @ W_hh^T + b_hh per
    step so the backward never recomputes the hidden projection."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = xw_ref.shape[1]
    hdim = h_scr.shape[-1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    def body(i, _):
        valid = t * tc + i < t_real
        r, z, n, _, hh = _gates(
            xw_ref[:, i], h_scr[:], whh_ref[:], bhh_ref[0], hdim
        )
        if hhs_ref is not None:
            hhs_ref[:, i] = hh
        h = (1.0 - z) * n + z * h_scr[:]
        h_scr[:] = jnp.where(valid, h, h_scr[:])
        ys_ref[:, i] = h
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        hn_out_ref[:] = h_scr[:]


def _fwd_kernel_savehh(
    xw_ref, whh_ref, bhh_ref, h0_ref, ys_ref, hn_out_ref, hhs_ref, h_scr,
    *, t_real,
):
    _fwd_kernel(
        xw_ref, whh_ref, bhh_ref, h0_ref, ys_ref, hn_out_ref, h_scr,
        t_real=t_real, hhs_ref=hhs_ref,
    )


def _bwd_kernel(
    xw_ref, whh_ref, hh_ref, ysp_ref, dys_ref, dhn_ref,
    dxw_ref, dhh_ref, dh0_ref,
    dh_scr,
    *, t_real,
):
    """Reverse-streamed BPTT chain (see pallas_lstm._bwd_kernel).

    hh = h_{t-1} @ W_hh^T + b_hh is hoisted to one host-side einsum
    (ysp carries the right-shifted trajectory with h0 in slot 0); dW_hh
    and db_hh reduce OUTSIDE over the dhh output. Only the sequential dh
    chain's single matmul stays in-kernel.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    tc = xw_ref.shape[1]
    hdim = ysp_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhn_ref[:]

    whh_t = whh_ref[:]

    def body(j, _):
        i = tc - 1 - j
        global_idx = (nt - 1 - t) * tc + i
        valid = global_idx < t_real
        h_prev = ysp_ref[:, i]

        r, z, n, hn = _gates_from_hh(xw_ref[:, i], hh_ref[:, i], hdim)

        dh = dys_ref[:, i] + dh_scr[:]
        dz = dh * (h_prev - n)
        dn = dh * (1.0 - z)
        dh_prev = dh * z

        dgn = dn * (1.0 - n * n)
        dr = dgn * hn
        dhn = dgn * r
        dgr = dr * r * (1.0 - r)
        dgz = dz * z * (1.0 - z)

        dxw = jnp.concatenate([dgr, dgz, dgn], axis=-1)  # (B, 3H)
        dhh = jnp.concatenate([dgr, dgz, dhn], axis=-1)  # (B, 3H)
        dxw = jnp.where(valid, dxw, 0.0)
        dhh = jnp.where(valid, dhh, 0.0)

        dxw_ref[:, i] = dxw
        dhh_ref[:, i] = dhh
        # the ONLY sequential matmul: the dh chain back one step
        dh_prev = dh_prev + jax.lax.dot_general(
            dhh.astype(whh_t.dtype), whh_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_scr[:] = jnp.where(valid, dh_prev, dh_scr[:])
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(t == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]


from multimodalreactiongeneration_tpu.ops.partitioning import (
    chunk_t as _chunk_t,
    pad_time as _pad_time,
)


def _fwd_common(xw, w_hh_t, b_hh, h0, save_hh):
    tc = _chunk_t(xw.shape[0])
    xw_p, t_real = _pad_time(xw, PAD_T)  # batch-independent pad; tc | PAD_T
    b, t_pad, g3 = xw_p.shape
    h = g3 // 3
    nt = t_pad // tc
    b_hh2 = b_hh.reshape(1, g3)

    chunk_spec = lambda d: pl.BlockSpec(
        (b, tc, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec((b, h), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)
    out_specs = [chunk_spec(h), state_spec]
    out_shape = [
        jax.ShapeDtypeStruct((b, t_pad, h), jnp.float32),
        jax.ShapeDtypeStruct((b, h), jnp.float32),
    ]
    kernel = _fwd_kernel
    if save_hh:
        kernel = _fwd_kernel_savehh
        out_specs.append(chunk_spec(g3))
        out_shape.append(jax.ShapeDtypeStruct((b, t_pad, g3), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(kernel, t_real=t_real),
        grid=(nt,),
        in_specs=[
            chunk_spec(g3),
            pl.BlockSpec((h, g3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            state_spec,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=_COMPILER_PARAMS,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
    )(xw_p, w_hh_t, b_hh2, h0)
    ys, hn = outs[:2]
    if save_hh:
        # hh stays padded — the bwd kernel consumes the padded layout
        return ys[:, :t_real], hn, outs[2]
    return ys[:, :t_real], hn


def _fwd_impl(xw, w_hh_t, b_hh, h0):
    """Positional-only (custom_partitioning traces keyword defaults)."""
    return _fwd_common(xw, w_hh_t, b_hh, h0, False)


def _fwd_impl_savehh(xw, w_hh_t, b_hh, h0):
    return _fwd_common(xw, w_hh_t, b_hh, h0, True)


def _bwd_impl(xw, w_hh_t, h0, ys, hh_all, dys, dhn):
    tc = _chunk_t(xw.shape[0])  # local blocking; shapes use PAD_T
    xw_p, t_real = _pad_time(xw, PAD_T)
    ys_p, _ = _pad_time(ys, PAD_T)
    dys_p, _ = _pad_time(dys, PAD_T)
    b, t_pad, g3 = xw_p.shape
    h = g3 // 3
    nt = t_pad // tc
    rev = lambda t: (0, nt - 1 - t, 0)
    mm = w_hh_t.dtype  # bf16 weights -> bf16 matmuls, f32 accumulate
    # right-shifted trajectory with the TRUE initial state in slot 0;
    # hh_all comes in PADDED straight from the vjp-fwd kernel
    ys_shift = jnp.concatenate([h0[:, None], ys_p[:, :-1]], axis=1)

    dxw, dhh, dh0_out = pl.pallas_call(
        functools.partial(_bwd_kernel, t_real=t_real),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, tc, g3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, g3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, tc, g3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, g3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, g3), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, g3), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
    )(xw_p, w_hh_t, hh_all, ys_shift, dys_p, dhn)

    # weight/bias grads reduce over the whole sequence OUTSIDE the
    # sequential chain (padding steps are zeroed by the valid mask).
    # Precision.HIGHEST: default TPU precision (single-pass bf16
    # operands) costs 5-15% relative dW error under this contraction's
    # cancellation (measured on the LSTM twin, round 5); no-op for
    # bf16 operands
    dwhh = jnp.einsum(
        "bth,btg->hg", ys_shift.astype(mm), dhh.astype(mm),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(w_hh_t.dtype)
    dbhh = jnp.sum(dhh, axis=(0, 1))
    return dxw[:, :t_real], dwhh, dbhh, dh0_out


# SPMD batch partitioning; see ops/partitioning.py and pallas_lstm.py
from multimodalreactiongeneration_tpu.ops.partitioning import (  # noqa: E402
    shard_batch_dim,
)

_fwd_sharded = shard_batch_dim(
    _fwd_impl, batch_args=(0, 3), out_is_batched=(True, True),
    sharding_rule="b t g, h g, g, b h -> b t h, b h",
)
_fwd_sharded_savehh = shard_batch_dim(
    _fwd_impl_savehh, batch_args=(0, 3),
    out_is_batched=(True, True, True),
    sharding_rule="b t g, h g, g, b h -> b t h, b h, b s g",
)
_bwd_sharded = shard_batch_dim(
    _bwd_impl, batch_args=(0, 2, 3, 4, 5, 6),
    out_is_batched=(True, False, False, True),
    reduce_outs=(1, 2),
    sharding_rule=(
        "b t g, h g, b h, b t h, b s g, b t h, b h -> b t g, h g, g, b h"
    ),
)


@jax.custom_vjp
def gru_recurrence(xw, w_hh_t, b_hh, h0):
    """Fused GRU: xw (B,T,3H) = x @ W_ih^T + b_ih; w_hh_t (H,3H);
    b_hh (3H); h0 (B,H). Returns (ys (B,T,H), h_n)."""
    ys, hn = _fwd_sharded(xw, w_hh_t, b_hh, h0)
    return ys, hn


def _vjp_fwd(xw, w_hh_t, b_hh, h0):
    # saves hh (replacing the backward's hoisted recompute einsum);
    # b_hh's gradient reduces from dhh outside, so it isn't a residual
    ys, hn, hh = _fwd_sharded_savehh(xw, w_hh_t, b_hh, h0)
    return (ys, hn), (xw, w_hh_t, h0, ys, hh)


def _vjp_bwd(res, cot):
    xw, w_hh_t, h0, ys, hh = res
    dys, dhn = cot
    return _bwd_sharded(xw, w_hh_t, h0, ys, hh, dys, dhn)


gru_recurrence.defvjp(_vjp_fwd, _vjp_bwd)
