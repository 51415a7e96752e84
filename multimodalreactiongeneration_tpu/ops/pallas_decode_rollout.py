"""Pallas TPU kernel: the ENTIRE hoisted AR decode rollout as one program.

The production Metaformer decode (infer/generate.py generate_metaformer,
shared KV layout + hoisted encoders) is a lax.scan whose per-step body is
  main-emb LSTM cell -> 2 folded cross-attends over shared raw ring
  buffers -> cat/FFN -> output head -> AR feedback
per metaformer block. Under XLA the ring buffers (8.2 MB bf16 audio +
1 MB motion at the bench size) are scan carries that live in HBM: every
one of the 10 attends per step re-streams its cache from HBM, and the
measured attention cost (~24 ms of the 38 ms generation,
benchmarks/decode_breakdown.py) sits at that streaming floor.

This kernel runs the WHOLE rollout as one pallas_call with grid=(steps,):
scratch memory persists across sequential TPU grid steps, so the ring
buffers are written once per step and READ FROM VMEM by all ten attends.
A 250-step attention-only probe (benchmarks/fused_attn_probe.py)
measures the VMEM-resident kernel at 6.6 ms vs 10.1 ms for the
identically-restructured XLA scan (and vs ~24 ms for the production
attention path before the bf16 operand fix).

Everything the step needs lives in VMEM for the whole generation
(~30 MB at the bench size: folded weights ~19 MB bf16 + caches ~9 MB),
and the only HBM traffic per step is the streamed per-step inputs
(precomputed other-modality encodings, teacher-forcing embeddings) and
the (B, out) output row.

Weight folding (exact reassociations, mirroring TorchMHA.attend_raw,
nn/attention.py:160-237):
  * q-side:  W̃q[:, h*H:(h+1)*H] = W_q^T[:, h*dh:(h+1)*dh] @ W_k[h*dh:(h+1)*dh, :]
             b̃q[h*H:(h+1)*H]    = b_q[h*dh:(h+1)*dh] @ W_k_h
    (the k-bias cancels in softmax — proven in attend_raw's docstring)
  * out-side: W̃o[h*H:(h+1)*H, :] = W_v_h^T @ W_out^T[h*dh:(h+1)*dh, :]
             b̃o = b_v @ W_out^T + b_out   (attention weights sum to 1)
so each attend is two (H, heads*H) matmuls around the batched
logits/context dots — no per-head einsum chain in the hot loop.

The AR feedback is folded the same way: the next step's main-modality
embedding is  relu_hidden @ (W_out2 @ W_emb0) + (b_out2 @ W_emb0 + b_emb0)
blended with the PRECOMPUTED teacher-forcing embedding by the per-step
scalar sampling mask (scalar blend commutes with the affine embedding).

Supported configuration (the production decode shape; the caller
falls back to the XLA scan otherwise — see generate_metaformer):
  lstm main embedding, num_layerd=1, num_internal_layer=1,
  nonlinearity none, ffn_nonlinearity relu, residual+LN on, bias on,
  no interlayer residual, audio budget and ratio multiples of 8,
  dropout-free (deterministic inference).

Numerics: f32 activations, LayerNorms, softmax and accumulations;
matmul inputs cast to the weight dtype (bf16 on TPU = full-rate MXU,
f32 in tests = exact). Parity vs the XLA hoisted scan is tested in
interpret mode (tests/test_pallas_decode_rollout.py) and was driven
on-chip (real Mosaic lowering) 2026-08-19 at a reduced f32 shape:
teacher-forced per-step max-abs vs the highest-precision XLA scan is
~1e-6 at EVERY step of a 60-step rollout (exact per-step math); in
free-running mode the same ULPs amplify chaotically through the AR
feedback (~1.3x/step on a random-init model, 1e-6 -> 0.7 by step 60)
— an intrinsic property of comparing any two non-bit-identical
implementations of a sensitive dynamical system, not kernel error.
Teacher-forced bf16 drift vs the f32 scan: max 0.032 abs, ~1%
rmse-over-std. The bf16 end-to-end drift is bounded by the same tests
that gate the bf16 KV default (tests/test_generate.py).

VMEM budget: bf16 caches + bf16 panels fit the production size with
room (the shipping config). ALL-f32 at the production size does NOT
compile on v5e — 129 MB of 128 MB, 71.6 MB of it register-allocator
spill slots (measured 2026-08-19) — so generate_metaformer's "auto"
only selects the kernel for bf16 caches; f32 stays reachable
explicitly for tests/smaller shapes.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalreactiongeneration_tpu.ops.partitioning import (
    make_sharding_rule,
    shard_any_dim,
)

LN_EPS = 1e-5
NEG = -1e30
OUT_PAD = 128  # lane-padded output row (first out_dim columns real)

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=110 * 1024 * 1024
)


def _ln(x, g, b):
    # flax LayerNorm fast-variance form, f32
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * g + b


def _kernel(
    # streams (blocked per grid step)
    ea_ref, em_ref, gt_ref,
    # scalar stream
    m_ref,
    # initial state
    ca0_ref, cm0_ref, h0_ref, c0_ref, main0_ref,
    # stacked block weights
    wih_ref, whh_ref, bg_ref, ln1g_ref, ln1b_ref,
    wef_ref, bef_ref, ln2g_ref, ln2b_ref,
    wqa_ref, bqa_ref, woa_ref, boa_ref,
    lnag_ref, lnab_ref, wfa_ref, bfa_ref, lnfag_ref, lnfab_ref,
    wqm_ref, bqm_ref, wom_ref, bom_ref,
    lnmg_ref, lnmb_ref, wfm_ref, bfm_ref, lnfmg_ref, lnfmb_ref,
    wcat_ref, bcat_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, lnfg_ref, lnfb_ref,
    # head + feedback
    wo1_ref, bo1_ref, wo2_ref, bo2_ref, wfb_ref, bfb_ref,
    # output
    ys_ref,
    # scratch
    ca_scr, cm_scr, h_scr, c_scr, main_scr,
    *,
    num_blocks: int,
    heads: int,
    hidden: int,
    ratio: int,
    len_a0: int,
    len_m0: int,
    bud_m: int,
):
    t = pl.program_id(0)
    B = main0_ref.shape[0]
    H = hidden
    sa = ca_scr.shape[1]
    sm = cm_scr.shape[1]
    dh = H // heads
    scale = 1.0 / (dh ** 0.5)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _init():
        ca_scr[...] = ca0_ref[...]
        cm_scr[...] = cm0_ref[...]
        h_scr[...] = h0_ref[...]
        c_scr[...] = c0_ref[...]
        main_scr[...] = main0_ref[...]

    # ring extends (audio: aligned contiguous chunk — budget and ratio
    # are multiples of 8 and the primed length is a chunk multiple;
    # motion: where-select single slot, alignment-free)
    off_a = pl.multiple_of(jax.lax.rem(len_a0 + t * ratio, sa), 8)
    ca_scr[:, pl.ds(off_a, ratio), :] = ea_ref[0]
    off_m = jax.lax.rem(len_m0 + t, bud_m)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (B, sm, H), 1)
    cm_scr[...] = jnp.where(
        iota_m == off_m, em_ref[0][:, None, :], cm_scr[...]
    )

    vis_a = jnp.minimum(len_a0 + (t + 1) * ratio, sa)
    vis_m = jnp.minimum(len_m0 + t + 1, bud_m)
    ca = ca_scr[...]
    cm = cm_scr[...]
    mm = wih_ref.dtype  # matmul input dtype (bf16 on TPU, f32 in tests)

    def dot(x, w):
        return jax.lax.dot(
            x.astype(mm), w, preferred_element_type=f32
        )

    def attend(y, cache, vis, wq, bq, wo, bo):
        s = cache.shape[1]
        qh = (dot(y, wq) + bq).reshape(B, heads, H)
        logits = jax.lax.dot_general(
            qh.astype(cache.dtype), cache, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        ) * scale
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, heads, s), 2)
        logits = jnp.where(iota >= vis, NEG, logits)
        w = jax.nn.softmax(logits, axis=-1)
        ctx = jax.lax.dot_general(
            w.astype(cache.dtype), cache, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        return dot(ctx.reshape(B, heads * H), wo) + bo

    x = main_scr[...]
    for l in range(num_blocks):
        # --- main-modality LSTM cell + residual/LN + FF/LN ------------
        h, c = h_scr[l], c_scr[l]
        gates = dot(x, wih_ref[l]) + dot(h, whh_ref[l]) + bg_ref[l]
        i_g = jax.nn.sigmoid(gates[:, :H])
        f_g = jax.nn.sigmoid(gates[:, H:2 * H])
        g_g = jnp.tanh(gates[:, 2 * H:3 * H])
        o_g = jax.nn.sigmoid(gates[:, 3 * H:])
        c2 = f_g * c + i_g * g_g
        h2 = o_g * jnp.tanh(c2)
        h_scr[l] = h2
        c_scr[l] = c2
        y = _ln(h2 + x, ln1g_ref[l], ln1b_ref[l])
        y = _ln(dot(y, wef_ref[l]) + bef_ref[l] + y,
                ln2g_ref[l], ln2b_ref[l])

        # --- integrators: folded attends over the shared rings --------
        att_a = attend(y, ca, vis_a,
                       wqa_ref[l], bqa_ref[l], woa_ref[l], boa_ref[l])
        ya = _ln(att_a + y, lnag_ref[l], lnab_ref[l])
        ya = _ln(dot(ya, wfa_ref[l]) + bfa_ref[l] + ya,
                 lnfag_ref[l], lnfab_ref[l])
        att_m = attend(y, cm, vis_m,
                       wqm_ref[l], bqm_ref[l], wom_ref[l], bom_ref[l])
        ym = _ln(att_m + y, lnmg_ref[l], lnmb_ref[l])
        ym = _ln(dot(ym, wfm_ref[l]) + bfm_ref[l] + ym,
                 lnfmg_ref[l], lnfmb_ref[l])

        # --- merge + block FFN ----------------------------------------
        merged = (dot(ya, wcat_ref[l][:H]) + dot(ym, wcat_ref[l][H:])
                  + bcat_ref[l])
        ff = jnp.maximum(dot(merged, w1_ref[l]) + b1_ref[l], 0.0)
        x = _ln(dot(ff, w2_ref[l]) + b2_ref[l] + merged,
                lnfg_ref[l], lnfb_ref[l])

    # --- output head + AR feedback ------------------------------------
    o1 = jnp.maximum(dot(x, wo1_ref[...]) + bo1_ref[...], 0.0)
    ys_ref[0] = dot(o1, wo2_ref[...]) + bo2_ref[...]
    pred_emb = dot(o1, wfb_ref[...]) + bfb_ref[...]
    m = m_ref[t]
    main_scr[...] = m * pred_emb + (1.0 - m) * gt_ref[0]


def fold_decode_params(params: Dict[str, Any], num_blocks: int,
                       heads: int, mm_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Extract + fold the Metaformer decode weights into kernel layout.

    ``params`` is the model param tree; returns stacked (num_blocks, ...)
    f32 arrays with the attention q/out sides pre-folded per the module
    docstring, matmul panels cast to ``mm_dtype``.
    """
    mf = params["params"]["metaformer"]
    H = mf["feature_embedding_0"]["kernel"].shape[1]
    dh = H // heads

    def fold_q(mha):
        wq_t = mha["q_proj_weight"].T  # (H, H): q = y @ wq_t + bq
        wk = mha["k_proj_weight"]      # (H, kdim=H)
        cols = [wq_t[:, h * dh:(h + 1) * dh] @ wk[h * dh:(h + 1) * dh]
                for h in range(heads)]
        bq = mha["q_proj_bias"]
        bcols = [bq[h * dh:(h + 1) * dh] @ wk[h * dh:(h + 1) * dh]
                 for h in range(heads)]
        return jnp.concatenate(cols, axis=1), jnp.concatenate(bcols)

    def fold_o(mha):
        wv = mha["v_proj_weight"]      # (H, kdim=H)
        wo_t = mha["out_proj_weight"].T  # (H, H): out = ctx @ wo_t + bo
        rows = [wv[h * dh:(h + 1) * dh].T @ wo_t[h * dh:(h + 1) * dh]
                for h in range(heads)]
        bo = mha["v_proj_bias"] @ wo_t + mha["out_proj_bias"]
        return jnp.concatenate(rows, axis=0), bo

    stacks: Dict[str, list] = {}

    def put(name, x):
        stacks.setdefault(name, []).append(x)

    for l in range(num_blocks):
        bl = mf[f"block_{l}"]
        emb = bl["emb_0"]["block_0"]
        put("wih", emb["mixer"]["weight_ih_l0"].T)
        put("whh", emb["mixer"]["weight_hh_l0"].T)
        put("bg", emb["mixer"]["bias_ih_l0"] + emb["mixer"]["bias_hh_l0"])
        put("ln1g", emb["mixer_norm"]["scale"])
        put("ln1b", emb["mixer_norm"]["bias"])
        put("wef", emb["feed_forward"]["feedforward"]["kernel"])
        put("bef", emb["feed_forward"]["feedforward"]["bias"])
        put("ln2g", emb["feed_forward"]["LayerNorm_0"]["scale"])
        put("ln2b", emb["feed_forward"]["LayerNorm_0"]["bias"])
        for tag, idx in (("a", 0), ("m", 1)):
            g = bl[f"integrate_{idx}"]["block_0"]
            wq, bq = fold_q(g["mha_0"])
            wo, bo = fold_o(g["mha_0"])
            put(f"wq{tag}", wq)
            put(f"bq{tag}", bq)
            put(f"wo{tag}", wo)
            put(f"bo{tag}", bo)
            put(f"ln{tag}g", g["mixer_norm"]["scale"])
            put(f"ln{tag}b", g["mixer_norm"]["bias"])
            put(f"wf{tag}", g["feed_forward"]["feedforward"]["kernel"])
            put(f"bf{tag}", g["feed_forward"]["feedforward"]["bias"])
            put(f"lnf{tag}g", g["feed_forward"]["LayerNorm_0"]["scale"])
            put(f"lnf{tag}b", g["feed_forward"]["LayerNorm_0"]["bias"])
        put("wcat", bl["cat_linear"]["kernel"])
        put("bcat", bl["cat_linear"]["bias"])
        put("w1", bl["feed_forward"]["input"]["kernel"])
        put("b1", bl["feed_forward"]["input"]["bias"])
        put("w2", bl["feed_forward"]["output"]["kernel"])
        put("b2", bl["feed_forward"]["output"]["bias"])
        put("lnfg", bl["feed_forward"]["LayerNorm_0"]["scale"])
        put("lnfb", bl["feed_forward"]["LayerNorm_0"]["bias"])

    folded = {k: jnp.stack(v) for k, v in stacks.items()}

    out_ff = mf["output_ff"]
    wo2 = out_ff["output"]["kernel"]  # (bneck, out_dim)
    bo2 = out_ff["output"]["bias"]
    out_dim = wo2.shape[1]
    w0 = mf["feature_embedding_0"]["kernel"]  # (out_dim, H)
    b0 = mf["feature_embedding_0"]["bias"]
    folded["wo1"] = out_ff["input"]["kernel"]
    folded["bo1"] = out_ff["input"]["bias"]
    folded["wo2"] = jnp.pad(wo2, ((0, 0), (0, OUT_PAD - out_dim)))
    folded["bo2"] = jnp.pad(bo2, (0, OUT_PAD - out_dim))
    folded["wfb"] = wo2 @ w0
    folded["bfb"] = bo2 @ w0 + b0
    folded["emb0_w"] = w0  # host-side: gt/main0 embeddings
    folded["emb0_b"] = b0
    folded["out_dim"] = out_dim

    # big matmul panels run at mm_dtype; biases/LN params stay f32
    for k in list(folded):
        if k.startswith(("wih", "whh", "wq", "wo", "wcat", "wef",
                         "wf", "w1", "w2")):
            folded[k] = folded[k].astype(mm_dtype)
    return folded


_W_KEYS = [
    "wih", "whh", "bg", "ln1g", "ln1b", "wef", "bef", "ln2g", "ln2b",
    "wqa", "bqa", "woa", "boa", "lnag", "lnab", "wfa", "bfa",
    "lnfag", "lnfab",
    "wqm", "bqm", "wom", "bom", "lnmg", "lnmb", "wfm", "bfm",
    "lnfmg", "lnfmb",
    "wcat", "bcat", "w1", "b1", "w2", "b2", "lnfg", "lnfb",
    "wo1", "bo1", "wo2", "bo2", "wfb", "bfb",
]


def decode_rollout(
    folded: Dict[str, Any],
    ca0: jnp.ndarray,          # (B, SA, H) cache dtype
    cm0: jnp.ndarray,          # (B, SM_pad, H) cache dtype
    h0: jnp.ndarray,           # (NB, B, H) f32
    c0: jnp.ndarray,           # (NB, B, H) f32
    main0: jnp.ndarray,        # (B, H) f32 — embedded first input
    enc_a_steps: jnp.ndarray,  # (T, B, ratio, H) cache dtype
    enc_m_steps: jnp.ndarray,  # (T, B, H) cache dtype
    gt_emb: jnp.ndarray,       # (T, B, H) f32 — embedded teacher frames
    mask_f: jnp.ndarray,       # (T,) f32 — 1.0 = model sample
    *,
    heads: int,
    ratio: int,
    len_a0: int,
    len_m0: int,
    bud_m: int,
) -> jnp.ndarray:
    """Run the fused rollout; returns (T, B, out_dim) f32.

    Under a batch-sharded mesh the pallas_call is wrapped in
    `shard_any_dim` (GSPMD cannot auto-partition a Mosaic custom call):
    each device runs the unmodified kernel on its local dialogs with
    replicated weights — the rollout is embarrassingly parallel over
    the batch."""
    nb = h0.shape[0]
    out_dim = folded["out_dim"]
    weights = [folded[k] for k in _W_KEYS]

    def run(enc_a_steps, enc_m_steps, gt_emb, mask_f,
            ca0, cm0, h0, c0, main0, *weights):
        # built INSIDE the partitioned fn: shapes here are the local
        # shard's (global when unsharded)
        steps, b, _, hidden = enc_a_steps.shape
        full = lambda x: pl.BlockSpec(
            x.shape, lambda t: tuple(0 for _ in x.shape),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            functools.partial(
                _kernel,
                num_blocks=nb,
                heads=heads,
                hidden=hidden,
                ratio=ratio,
                len_a0=len_a0,
                len_m0=len_m0,
                bud_m=bud_m,
            ),
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, b, ratio, hidden),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, hidden), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, hidden), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                full(ca0), full(cm0), full(h0), full(c0), full(main0),
                *[full(w) for w in weights],
            ],
            out_specs=pl.BlockSpec((1, b, OUT_PAD), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (steps, b, OUT_PAD), jnp.float32
            ),
            compiler_params=_COMPILER_PARAMS,
            scratch_shapes=[
                pltpu.VMEM(ca0.shape, ca0.dtype),
                pltpu.VMEM(cm0.shape, cm0.dtype),
                pltpu.VMEM(h0.shape, jnp.float32),
                pltpu.VMEM(c0.shape, jnp.float32),
                pltpu.VMEM(main0.shape, jnp.float32),
            ],
        )(enc_a_steps, enc_m_steps, gt_emb, mask_f,
          ca0, cm0, h0, c0, main0, *weights)

    operands = [enc_a_steps, enc_m_steps, gt_emb, mask_f,
                ca0, cm0, h0, c0, main0, *weights]
    arg_dims = [1, 1, 1, None, 0, 0, 1, 1, 0] + [None] * len(weights)
    rule = make_sharding_rule(
        [(x.ndim, d) for x, d in zip(operands, arg_dims)],
        [(3, 1)],
    )
    sharded = shard_any_dim(run, arg_dims, [1], sharding_rule=rule)
    ys = sharded(*operands)
    return ys[:, :, :out_dim]
