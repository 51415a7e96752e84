"""LSTM / GRU with torch-parity numerics, built on lax.scan.

The reference leans on cuDNN nn.LSTM/nn.GRU everywhere (lstm_block.py:21-28,
mixer_block.py:194-246, lstm_sampler.py:16-23). The TPU-native design:

  * the input projection x @ W_ih^T (+bias) for the WHOLE sequence is one
    large batched matmul hoisted out of the recurrence — it runs on the MXU
    at full tilt; only the h @ W_hh^T recurrence lives inside lax.scan.
  * gate order, weight layout and bias split match torch exactly
    (LSTM gates i,f,g,o; GRU gates r,z,n with b_hn kept inside the reset
    product), so a torch state_dict maps 1:1 — verified against torch.nn
    in tests/test_recurrent.py.
  * bidirectional = forward scan + reversed scan, concat on features;
    final states stacked (num_layers * num_directions, B, H) like torch.

State convention: ``hx`` is (h, c) for LSTM, h for GRU, shaped like torch's
(num_layers * num_directions, B, H). ``None`` means zeros.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

LSTMState = Tuple[jnp.ndarray, jnp.ndarray]


def resolve_impl(impl: str, seq_len: int) -> str:
    """Resolve "auto" to a concrete recurrence implementation.

    Order: explicit module arg > MRGEN_RNN_IMPL env (deployment escape
    hatch — e.g. multi-chip GSPMD cannot auto-partition the Mosaic
    kernels, so pods sharding activations over 'data' set
    MRGEN_RNN_IMPL=scan) > backend default (pallas on TPU, scan
    elsewhere). Decode-sized sequences (< 16 steps) always use scan: the
    kernel's chunk padding would cost more than it saves.
    """
    if impl == "auto":
        impl = os.environ.get("MRGEN_RNN_IMPL", "auto")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    if impl == "pallas" and seq_len < 16:
        impl = "scan"
    return impl


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _lstm_scan(x, h0, c0, w_ih, w_hh, b_ih, b_hh, reverse: bool):
    """Single-layer, single-direction LSTM over (B, T, I).

    Recurrence runs in x.dtype (bf16-friendly); matmuls accumulate in f32
    on the MXU and cast back so the scan carry dtype stays stable."""
    dtype = x.dtype
    xw = (
        jnp.einsum("bti,hi->bth", x, w_ih, preferred_element_type=jnp.float32)
        + b_ih
        + b_hh
    ).astype(dtype)
    w_hh_t = w_hh.T  # (H, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(
            h, w_hh_t, preferred_element_type=jnp.float32
        ).astype(dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = (f * c + i * g).astype(dtype)
        h = (o * jnp.tanh(c)).astype(dtype)
        return (h, c), h

    # short sequences (the AR-decode embeddings: ratio=8 audio frames or
    # a single motion frame per step) unroll fully — no loop bookkeeping
    # nested inside the already-unrolled decode scan. Cutoff 8, not
    # higher: unrolling simple_lstm's ctx-15 windows bloats its rollout
    # body and measured 30% SLOWER
    t = xw.shape[1]
    (h, c), ys = jax.lax.scan(
        step, (h0, c0), jnp.swapaxes(xw, 0, 1), reverse=reverse,
        unroll=t if 0 < t <= 8 else 1,
    )
    return jnp.swapaxes(ys, 0, 1), (h, c)


def _gru_scan(x, h0, w_ih, w_hh, b_ih, b_hh, reverse: bool):
    """Single-layer, single-direction GRU over (B, T, I)."""
    dtype = x.dtype
    xw = (
        jnp.einsum("bti,hi->bth", x, w_ih, preferred_element_type=jnp.float32)
        + b_ih
    ).astype(dtype)
    w_hh_t = w_hh.T  # (H, 3H)

    def step(h, xt):
        hh = (
            jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32) + b_hh
        ).astype(dtype)
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = ((1.0 - z) * n + z * h).astype(dtype)
        return h, h

    t = xw.shape[1]
    h, ys = jax.lax.scan(
        step, h0, jnp.swapaxes(xw, 0, 1), reverse=reverse,
        unroll=t if 0 < t <= 8 else 1,
    )
    return jnp.swapaxes(ys, 0, 1), h


class TorchLSTM(nn.Module):
    """torch.nn.LSTM(batch_first=True) equivalent.

    impl="pallas" routes each direction's recurrence through the fused
    Pallas kernel (ops/pallas_lstm.py) — bitwise-identical numerics on
    TPU, one program for the whole sequence instead of one dispatch per
    scan step: 2.1x forward, 35x forward+backward at (B32, T1120, H256)
    (XLA's scan autodiff is pathologically slow; the kernel does BPTT
    with recomputed gates). impl="auto" (default) picks pallas on TPU,
    scan elsewhere.
    """

    input_size: int
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    impl: str = "auto"  # "auto" | "scan" | "pallas"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        hx: Optional[LSTMState] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, LSTMState]:
        batch = x.shape[0]
        num_dir = 2 if self.bidirectional else 1
        bound = 1.0 / math.sqrt(self.hidden_size)
        init = _uniform_init(bound)
        impl = resolve_impl(self.impl, x.shape[1])

        if hx is None:
            zeros = jnp.zeros(
                (self.num_layers * num_dir, batch, self.hidden_size), x.dtype
            )
            hx = (zeros, zeros)
        h0_all, c0_all = hx

        # create every layer's params up front (same names/order on all
        # paths, so torch ckpt import/export mappings never fork)
        params = []
        in_size = x.shape[-1]
        for layer in range(self.num_layers):
            per_dir = []
            for direction in range(num_dir):
                sfx = f"l{layer}" + ("_reverse" if direction else "")
                per_dir.append((
                    self.param(
                        f"weight_ih_{sfx}", init,
                        (4 * self.hidden_size, in_size),
                    ),
                    self.param(
                        f"weight_hh_{sfx}", init,
                        (4 * self.hidden_size, self.hidden_size),
                    ),
                    self.param(f"bias_ih_{sfx}", init, (4 * self.hidden_size,)),
                    self.param(f"bias_hh_{sfx}", init, (4 * self.hidden_size,)),
                ))
            params.append(per_dir)
            in_size = self.hidden_size * num_dir

        # multi-layer unidirectional stacks with inactive dropout run as
        # ONE wavefront kernel: the sequential chain is T+L-1 slots
        # instead of L x T steps (ops/pallas_lstm_stacked.py) — the
        # production encoders (encoder_num_layer=5, dropout 0) all
        # qualify
        if (
            impl == "pallas"
            and num_dir == 1
            and self.num_layers > 1
            and (self.dropout == 0 or deterministic)
        ):
            from multimodalreactiongeneration_tpu.ops.pallas_lstm_stacked import (
                lstm_stacked_recurrence,
            )

            w_ih0, w_hh0, b_ih0, b_hh0 = params[0][0]
            mm_dtype = (
                jnp.bfloat16
                if w_hh0.dtype == jnp.bfloat16
                else jnp.float32
            )
            xw0 = (
                jnp.einsum(
                    "bti,hi->bth", x, w_ih0,
                    preferred_element_type=jnp.float32,
                )
                + b_ih0
                + b_hh0
            ).astype(jnp.float32)
            w_ih_t = jnp.stack(
                [p[0][0].T for p in params[1:]]
            ).astype(mm_dtype)
            b_rest = jnp.stack(
                [p[0][2] + p[0][3] for p in params[1:]]
            ).astype(jnp.float32)
            w_hh_t = jnp.stack([p[0][1].T for p in params]).astype(mm_dtype)
            ys, (hn, cn) = lstm_stacked_recurrence(
                xw0,
                w_ih_t,
                b_rest,
                w_hh_t,
                h0_all.astype(jnp.float32),
                c0_all.astype(jnp.float32),
            )
            return ys.astype(x.dtype), (
                hn.astype(x.dtype),
                cn.astype(x.dtype),
            )

        h_out, c_out = [], []
        layer_in = x
        for layer in range(self.num_layers):
            outs = []
            for direction in range(num_dir):
                w_ih, w_hh, b_ih, b_hh = params[layer][direction]
                idx = layer * num_dir + direction
                if impl == "pallas":
                    from multimodalreactiongeneration_tpu.ops.pallas_lstm import (
                        lstm_layer,
                        lstm_recurrence,
                    )
                    from multimodalreactiongeneration_tpu.ops.pallas_lstm_stacked import (
                        _fused_dw_enabled,
                    )

                    x_dir = (
                        jnp.flip(layer_in, axis=1) if direction else layer_in
                    )
                    # kernel state/accumulation are f32; the weight dtype
                    # selects the MXU matmul precision — bf16 params run
                    # the recurrent matmuls at full MXU rate (the bf16
                    # train-step win), f32 params keep full f32 numerics
                    mm_dtype = (
                        jnp.bfloat16
                        if w_hh.dtype == jnp.bfloat16
                        else jnp.float32
                    )
                    if (
                        _fused_dw_enabled()
                        and x_dir.shape[-1] % 128 == 0
                        and self.hidden_size % 128 == 0
                    ):
                        # round-5 fully-fused layer: backward consumes
                        # dgates in VMEM (dx/dW/db in-kernel) instead of
                        # materializing the (B, T, 4H) trajectory for
                        # outside einsums — the measured 11.6 ms/step of
                        # post-kernel dW/bias reductions in the B32xT240
                        # metaformer profile (ops/pallas_lstm.py)
                        ys, (h, c) = lstm_layer(
                            x_dir.astype(mm_dtype),
                            w_ih.T.astype(mm_dtype),
                            (b_ih + b_hh).astype(jnp.float32),
                            w_hh.T.astype(mm_dtype),
                            h0_all[idx].astype(jnp.float32),
                            c0_all[idx].astype(jnp.float32),
                        )
                    else:
                        xw = (
                            jnp.einsum(
                                "bti,hi->bth", x_dir, w_ih,
                                preferred_element_type=jnp.float32,
                            )
                            + b_ih
                            + b_hh
                        )
                        ys, (h, c) = lstm_recurrence(
                            xw.astype(jnp.float32),
                            w_hh.T.astype(mm_dtype),
                            h0_all[idx].astype(jnp.float32),
                            c0_all[idx].astype(jnp.float32),
                        )
                    ys = ys.astype(x.dtype)
                    h = h.astype(x.dtype)
                    c = c.astype(x.dtype)
                    if direction:
                        ys = jnp.flip(ys, axis=1)
                else:
                    ys, (h, c) = _lstm_scan(
                        layer_in,
                        h0_all[idx],
                        c0_all[idx],
                        w_ih,
                        w_hh,
                        b_ih,
                        b_hh,
                        reverse=bool(direction),
                    )
                outs.append(ys)
                h_out.append(h)
                c_out.append(c)
            layer_in = outs[0] if num_dir == 1 else jnp.concatenate(outs, -1)
            if self.dropout > 0 and layer < self.num_layers - 1:
                layer_in = nn.Dropout(self.dropout)(
                    layer_in, deterministic=deterministic
                )
        return layer_in, (jnp.stack(h_out), jnp.stack(c_out))


class TorchGRU(nn.Module):
    """torch.nn.GRU(batch_first=True) equivalent.

    impl="auto" routes long recurrences through the fused Pallas kernel
    on TPU (ops/pallas_gru.py), like TorchLSTM.
    """

    input_size: int
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    impl: str = "auto"  # "auto" | "scan" | "pallas"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        hx: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        batch = x.shape[0]
        num_dir = 2 if self.bidirectional else 1
        bound = 1.0 / math.sqrt(self.hidden_size)
        init = _uniform_init(bound)
        impl = resolve_impl(self.impl, x.shape[1])

        if hx is None:
            hx = jnp.zeros(
                (self.num_layers * num_dir, batch, self.hidden_size), x.dtype
            )

        h_out = []
        layer_in = x
        for layer in range(self.num_layers):
            in_size = layer_in.shape[-1]
            outs = []
            for direction in range(num_dir):
                sfx = f"l{layer}" + ("_reverse" if direction else "")
                w_ih = self.param(
                    f"weight_ih_{sfx}", init, (3 * self.hidden_size, in_size)
                )
                w_hh = self.param(
                    f"weight_hh_{sfx}",
                    init,
                    (3 * self.hidden_size, self.hidden_size),
                )
                b_ih = self.param(f"bias_ih_{sfx}", init, (3 * self.hidden_size,))
                b_hh = self.param(f"bias_hh_{sfx}", init, (3 * self.hidden_size,))
                idx = layer * num_dir + direction
                if impl == "pallas":
                    from multimodalreactiongeneration_tpu.ops.pallas_gru import (
                        gru_recurrence,
                    )

                    x_dir = (
                        jnp.flip(layer_in, axis=1) if direction else layer_in
                    )
                    xw = (
                        jnp.einsum(
                            "bti,hi->bth", x_dir, w_ih,
                            preferred_element_type=jnp.float32,
                        )
                        + b_ih
                    )
                    # weight dtype selects matmul precision; see the
                    # TorchLSTM pallas branch
                    mm_dtype = (
                        jnp.bfloat16
                        if w_hh.dtype == jnp.bfloat16
                        else jnp.float32
                    )
                    ys, h = gru_recurrence(
                        xw.astype(jnp.float32),
                        w_hh.T.astype(mm_dtype),
                        b_hh.astype(jnp.float32),
                        hx[idx].astype(jnp.float32),
                    )
                    ys = ys.astype(x.dtype)
                    h = h.astype(x.dtype)
                    if direction:
                        ys = jnp.flip(ys, axis=1)
                else:
                    ys, h = _gru_scan(
                        layer_in, hx[idx], w_ih, w_hh, b_ih, b_hh,
                        bool(direction),
                    )
                outs.append(ys)
                h_out.append(h)
            layer_in = outs[0] if num_dir == 1 else jnp.concatenate(outs, -1)
            if self.dropout > 0 and layer < self.num_layers - 1:
                layer_in = nn.Dropout(self.dropout)(
                    layer_in, deterministic=deterministic
                )
        return layer_in, jnp.stack(h_out)
