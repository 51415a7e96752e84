"""Autoregressive head-motion generation as one compiled lax.scan.

Re-design of the reference's AR decode (the headline benchmark,
BASELINE.md): head_motion_generation runs a per-timestep Python loop
calling the full model each step (lstm_with_sample.py:379-433,
lstmformer.py:466-521), timed into speed.log
(visualize_metaformer.py:116-127). Here the whole rollout —
warmup on the leading segment, per-step forward, scheduled-sampling
teacher forcing, state/KV-cache threading — is a single jitted
lax.scan: one XLA program, zero per-step Python dispatch.

Step semantics (bit-matched to the reference loop):
  * formed inputs: per step t, ``ratio`` audio frames, 1 partner-motion
    frame, and the *previous* self-motion frame (initially motion_s[0])
    (form_generation_init, lstm_with_sample.py:435-451)
  * prediction[t] = model(inputs_t, prev); next prev = prediction[t] if
    sampling_mask[t] else motion_s[t] (head_motion_generation :399-404)
  * sampling_mask: all-True = full generation; all-False = teacher
    forcing; Bernoulli(epoch/max_epochs) = scheduled sampling (:388-394)
  * -100 padded inputs are zeroed before the rollout
    (form_generation_init, lstmformer.py:539-545)

Documented deviation: the reference never actually carries the layered
LSTM state across steps (its LSTMLayerd returns the input states,
lstm_block.py:164-169) and its metaformer decode would shape-error on the
KV path; we thread all states correctly. ``carry_layerd_state=False``
reproduces the reference's effective lstm_with_sampling behavior
(sampler state carried, layered LSTM state not).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodalreactiongeneration_tpu.infer.cache import (
    cache_init,
    raw_cache_init,
)
from multimodalreactiongeneration_tpu.models.lstm_with_sampling import (
    derived_sizes as lws_sizes,
)
from multimodalreactiongeneration_tpu.models.lstmformer import (
    context_budgets,
    derived_sizes as mf_sizes,
)

PADDING_VALUE = -100.0


def _zero_padding(x: jnp.ndarray) -> jnp.ndarray:
    return x * (x != PADDING_VALUE)


def _form_steps(fbank, motion_p, motion_s, ratio: int):
    """(B, L*r, F), (B, L, D), (B, L, D) -> per-step scan inputs
    (L, B, r, F), (L, B, 1, D), (L, B, 1, D)  (reference :435-451)."""
    b, lr, f = fbank.shape
    l = motion_p.shape[1]
    fb = fbank.reshape(b, l, ratio, f).transpose(1, 0, 2, 3)
    mp = motion_p.transpose(1, 0, 2)[:, :, None, :]
    ms = motion_s.transpose(1, 0, 2)[:, :, None, :]
    return fb, mp, ms


def sampling_mask_for(
    length: int,
    mode: str,
    key: Optional[jax.Array] = None,
    rate: float = 0.0,
) -> jnp.ndarray:
    """"full" (all model), "teacher" (all ground truth), "scheduled"."""
    if mode == "full":
        return jnp.ones((length,), bool)
    if mode == "teacher":
        return jnp.zeros((length,), bool)
    if mode == "scheduled":
        if key is None:
            raise ValueError("scheduled sampling needs a PRNG key")
        return jax.random.uniform(key, (length,)) < rate
    raise ValueError(f"unknown sampling mode {mode!r}")


# ---------------------------------------------------------------------------
# LSTMwithSample
# ---------------------------------------------------------------------------


def generate_lws(
    model,
    params,
    batch_data: Tuple[jnp.ndarray, ...],
    sampling_mask: jnp.ndarray,
    carry_layerd_state: bool = True,
    unroll: int = 5,
) -> jnp.ndarray:
    """Rollout for LSTMwithSample. batch_data = 7-tuple of padded arrays
    (fbank_p, motion_p, motion_s, lead_fbank, lead_mp, lead_ms, target).
    Returns prediction (B, L, D) aligned with target."""
    fbank, motion_p, motion_s, lead_a, lead_mp, lead_ms, _ = [
        _zero_padding(x) for x in batch_data
    ]
    ratio = lws_sizes(model.cfg)["ratio"]
    fb, mp, ms = _form_steps(fbank, motion_p, motion_s, ratio)

    # warmup on the leading segment (reference warmup_model :374-377)
    _, state = model.apply(params, lead_a, lead_mp, lead_ms)
    if not carry_layerd_state:
        state = (state[0], None)

    def step(carry, xs):
        prev, st = carry
        fb_t, mp_t, ms_t, mask_t = xs
        y, new_st = model.apply(
            params, fb_t, mp_t, prev, None, None, None, st
        )
        if not carry_layerd_state:
            new_st = (new_st[0], None)
        nxt = jnp.where(mask_t, y, ms_t)
        return (nxt, new_st), y

    init = (ms[0], state)
    (_, _), ys = jax.lax.scan(
        step, init, (fb, mp, ms, sampling_mask), unroll=unroll
    )
    # ys: (L, B, 1, D) -> (B, L, D)
    return ys[:, :, 0, :].transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# Metaformer
# ---------------------------------------------------------------------------


def _init_metaformer_states(
    model_cfg: dict,
    batch: int,
    cache_dtype=jnp.bfloat16,
    kv_layout: str = "per_block",
    hoisted: bool = False,
):
    """Decode states: KV ring buffers sized by the per-modality context
    budgets (lstmformer.py:98-110); emb states start None.

    kv_layout="per_block": one projected-K/V ring buffer per (block,
    integrator, layer) — the general layout (works with
    repeat_with_encoder, int8 quantized caches).
    kv_layout="shared": ONE raw ring buffer per other modality holding
    block-0's pre-projection encodings, attended by every block with its
    projections folded into the query/output sides (attend_raw). Exact
    same attention math, 2 x num_block x smaller decode state — the
    measured-fastest inference layout (see generate_metaformer)."""
    budgets = context_budgets(model_cfg)
    hidden = model_cfg["hidden_size"]
    num_block = model_cfg["num_block"]
    num_layerd = model_cfg["num_layerd"]
    num_inner = model_cfg["num_internal_layer"]
    n_other = len(model_cfg["modalities"]) - 1
    main_idx = model_cfg["main_modal_idx"]
    emb_types = list(model_cfg["emb_mixers"])
    main_type = emb_types.pop(main_idx)
    # block-0 embedding order: [main] + others; later blocks main only
    acoustic_fps = model_cfg["sampling_rate"] / model_cfg["shift"]
    modal_rates = {"audio": acoustic_fps, "motion": model_cfg["pred_fps"]}
    other_modalities = list(model_cfg["modalities"])
    main_modality = other_modalities.pop(main_idx)
    emb_order = [(main_modality, main_type)] + list(
        zip(other_modalities, emb_types)
    )

    def emb_state(modality: str, mtype: str, layerd: int):
        """mha self-attention embeddings need their own ring buffers
        (without them a decode step would only attend itself); recurrent
        embeddings start from None states."""
        if mtype != "mha":
            return None
        budget = int(model_cfg["max_context_len"] * modal_rates[modality])
        return [
            [cache_init(batch, budget, hidden, dtype=cache_dtype)
             for _ in range(num_inner)]
            for _ in range(layerd)
        ]

    if kv_layout not in ("shared", "per_block"):
        raise ValueError(
            f"kv_layout must be 'shared' or 'per_block', got {kv_layout!r}"
        )
    if kv_layout == "shared" and model_cfg["repeat_with_encoder"]:
        raise ValueError(
            "kv_layout='shared' requires repeat_with_encoder=False; "
            "use kv_layout='per_block'"
        )
    if kv_layout == "shared" and cache_dtype == jnp.int8:
        # a raw int8 cache would truncate float encodings with no scales
        raise ValueError(
            "kv_layout='shared' does not support int8 caches (per-slot "
            "quantization scales live in the per_block layout)"
        )
    if hoisted and kv_layout != "shared":
        raise ValueError("hoisted encoders require kv_layout='shared'")

    states = []
    for b in range(num_block):
        # hoisted: the other-modality encoders run OUTSIDE the loop, so
        # block 0 carries only the main-modality emb state (like later
        # blocks) — the structure the precomputed_others path returns
        encode = (b == 0 and not hoisted) or model_cfg["repeat_with_encoder"]
        emb_here = emb_order if encode else emb_order[:1]
        emb_states = [
            emb_state(
                modality, mtype,
                num_layerd if m_i == 0 else model_cfg["encoder_num_layer"],
            )
            for m_i, (modality, mtype) in enumerate(emb_here)
        ]
        if kv_layout == "shared":
            # integrators attend the shared raw caches; their per-block
            # crm slots stay empty (structure mirrors what the block
            # returns: one [None]*layerd list per integrator)
            crm = [[None] * num_layerd for _ in range(n_other)]
        else:
            # crm[i] = per layerd-block list of per-inner-layer caches
            # holding POST-projection K/V (nn/mixers.MHAMixerBlock)
            crm = [
                [
                    [
                        cache_init(
                            batch, budgets[i], hidden, dtype=cache_dtype
                        )
                        for _ in range(num_inner)
                    ]
                    for _ in range(num_layerd)
                ]
                for i in range(n_other)
            ]
        states.append({"emb": emb_states, "crm": crm})
    if kv_layout == "shared":
        return {
            "shared": [
                raw_cache_init(batch, budgets[i], hidden, dtype=cache_dtype)
                for i in range(n_other)
            ],
            "blocks": states,
        }
    return states


def _fused_rollout_supported(
    cfg: dict, cache_dtype, ratio: int, len_a0: int
) -> bool:
    """Config shapes the fused Pallas rollout kernel handles
    (ops/pallas_decode_rollout.py docstring lists the contract).

    len_a0 (the primed audio-ring length) must be ratio-aligned: the
    kernel's contiguous `pl.ds(off_a, ratio)` ring write and its
    `pl.multiple_of(off_a, 8)` alignment promise are only sound when
    every write offset stays a ratio multiple — a misaligned priming
    segment would silently miscompile addresses on real TPU (the XLA
    scan handles it via elementwise modular scatter, so unsupported
    shapes just stay on that path)."""
    others = list(cfg["modalities"])
    others.pop(cfg["main_modal_idx"])
    budgets = context_budgets(cfg)
    sizes = mf_sizes(cfg)
    return (
        cfg["emb_mixers"][cfg["main_modal_idx"]] == "lstm"
        and cfg["num_layerd"] == 1
        and cfg["num_internal_layer"] == 1
        and cfg["nonlinearity"] in (None, "none")
        and cfg["ffn_nonlinearity"] == "relu"
        and bool(cfg["residual"])
        and bool(cfg["residual_layer_norm"])
        and bool(cfg["bias"])
        and not cfg["interlayer_residual"]
        and cache_dtype in (jnp.bfloat16, jnp.float32)
        and others == ["audio", "motion"]
        and cfg["hidden_size"] % cfg["num_heads"] == 0
        and ratio % 8 == 0
        and budgets[0] % ratio == 0
        and len_a0 % ratio == 0
        and sizes["motion_input_size"] <= 128
    )


def _fused_vmem_estimate(cfg, batch: int, cache_dtype, mm_dtype) -> int:
    """Raw resident-VMEM bytes of the fused rollout kernel: the folded
    weight panels ((21 + 4*heads)*NB*H^2 params per the fold in
    ops/pallas_decode_rollout.py: 8 wih/whh + 1 emb FFN + heads*H^2 per
    attention q/out side x 2 sides x 2 modalities + 2 integrator FFNs
    + 2 cat + 8 block FFN; bottleneck head panels are noise) + the ring
    caches TWICE (pallas input window + persistent scratch). Panels are
    sized at mm_dtype — the MRGEN_FUSED_MM=f32 escape hatch doubles
    them. Streams, biases, LN params and activations are noise at
    these sizes. Mosaic's register-spill slots roughly double this raw
    figure — the auto gate's threshold bakes that in (_resolve_fused).

    Caveat: under a batch-sharded mesh this sees the GLOBAL batch at
    trace time (operand shardings aren't knowable here), so auto may
    decline a global batch whose per-chip shard would fit —
    MRGEN_FUSED_DECODE=1 bypasses the estimate for that case."""
    H = cfg["hidden_size"]
    budgets = context_budgets(cfg)
    slots = sum(b + (-b) % 8 for b in budgets)
    panels = (
        (21 + 4 * cfg["num_heads"]) * cfg["num_block"] * H * H
        * jnp.dtype(mm_dtype).itemsize
    )
    caches = 2 * batch * slots * H * jnp.dtype(cache_dtype).itemsize
    return panels + caches


def _fused_mm_dtype(cache_dtype):
    """Matmul-panel dtype: follows the cache dtype (bf16 production,
    f32 parity tests); MRGEN_FUSED_MM=f32 keeps the weight panels f32
    under bf16 caches (numerics escape hatch, ~1.4x slower)."""
    import os

    mm = jnp.bfloat16 if cache_dtype == jnp.bfloat16 else jnp.float32
    if os.environ.get("MRGEN_FUSED_MM") == "f32":
        mm = jnp.float32
    return mm


def _fused_batch_chunk(cfg, batch: int, cache_dtype) -> int:
    """Largest batch slice whose fused working set fits the VMEM gate.

    Returns a divisor of ``batch`` (the whole batch when it fits, else
    the largest sublane-aligned divisor whose estimate clears the
    budget — the rollout is embarrassingly parallel over dialogs, so
    `_fused_rollout` just runs the kernel once per slice), or 0 when no
    slice fits (caller falls back to the XLA scan). Sub-batch slices
    must be multiples of 8: the batch is a block second-minor dim in
    the kernel and Mosaic pads misaligned sublanes per slice."""
    budget = 72 * 2 ** 20
    mm = _fused_mm_dtype(cache_dtype)
    if _fused_vmem_estimate(cfg, batch, cache_dtype, mm) <= budget:
        return batch
    for d in range(batch - 8, 0, -8):
        if batch % d == 0 and \
                _fused_vmem_estimate(cfg, d, cache_dtype, mm) <= budget:
            return d
    return 0


def _resolve_fused(
    fused_rollout, cfg, cache_dtype, ratio, batch, len_a0
) -> int:
    """"auto" -> fused when the config is supported AND we're on TPU
    (MRGEN_FUSED_DECODE=1/0 overrides the backend gate — tests force
    the interpret-mode kernel on CPU; pods that can't run Mosaic
    kernels can pin it off).

    Returns the batch-slice size the kernel should run at — ``batch``
    for one call, smaller for a VMEM-bound chunked rollout — or 0 for
    the XLA scan."""
    import os

    if fused_rollout is False:
        return 0
    ok = _fused_rollout_supported(cfg, cache_dtype, ratio, len_a0)
    if fused_rollout is True:
        if not ok:
            raise ValueError(
                "fused_rollout=True but the model config is outside the "
                "fused kernel's contract (see "
                "ops/pallas_decode_rollout.py)"
            )
        return batch
    env = os.environ.get("MRGEN_FUSED_DECODE", "auto")
    if env == "0":
        return 0
    if env == "1":
        # forced: whole batch in one call, no estimate — the bypass for
        # batch-sharded meshes where this sees the GLOBAL batch but
        # each chip runs only its shard
        return batch if ok else 0
    # auto on TPU: bf16 caches only, and only at a batch-slice size
    # whose VMEM-resident working set (folded weight panels + 2x ring
    # caches: input copy + scratch) fits. Empirical v5e anchors
    # (2026-08-19, all at the production config): est 43 MB (b16 bf16)
    # and 62 MB (b32 bf16) compile and run; est 86 MB (b16 all-f32) and
    # 98 MB (b64 bf16) fail Mosaic compile at 128 MB physical VMEM —
    # register-allocator spill slots roughly double the raw estimate.
    # 72 MB splits the measured pass/fail bands. Over-budget batches
    # run CHUNKED (largest fitting slice, e.g. 64 -> 2x32) and only
    # shapes with no fitting slice fall back to the XLA scan;
    # fused_rollout=True / env=1 still force a single full-batch call.
    if cache_dtype != jnp.bfloat16:
        return 0
    if not (ok and jax.default_backend() == "tpu"):
        return 0
    return _fused_batch_chunk(cfg, batch, cache_dtype)


def _fused_rollout(
    cfg, params, states, enc_a_steps, enc_mp_steps, ms, sampling_mask,
    cache_dtype, len_a0: int, len_m0: int, chunk: int = 0,
) -> jnp.ndarray:
    """Hand off the post-priming rollout to the fused Pallas kernel.

    chunk: batch-slice size from `_resolve_fused`. When smaller than
    the batch, the kernel runs once per slice (dialogs are independent,
    so slicing the batch is exact); the slices share one Mosaic
    compilation (identical shapes) and each keeps its working set under
    the VMEM gate — this is how batch 64+ stays fused instead of
    regressing to the XLA scan."""
    from multimodalreactiongeneration_tpu.ops.pallas_decode_rollout import (
        decode_rollout,
        fold_decode_params,
    )

    heads = cfg["num_heads"]
    ratio = enc_a_steps.shape[2]
    folded = fold_decode_params(
        params, cfg["num_block"], heads,
        mm_dtype=_fused_mm_dtype(cache_dtype),
    )

    ca0 = states["shared"][0]["x"]
    cm0 = states["shared"][1]["x"]
    bud_m = cm0.shape[1]
    pad_m = (-bud_m) % 8
    if pad_m:
        # motion ring storage lane-pads to a sublane multiple; padded
        # slots sit past the budget and stay masked forever
        cm0 = jnp.pad(cm0, ((0, 0), (0, pad_m), (0, 0)))
    h0 = jnp.stack(
        [states["blocks"][l]["emb"][0][0][0][0]
         for l in range(cfg["num_block"])]
    ).astype(jnp.float32)
    c0 = jnp.stack(
        [states["blocks"][l]["emb"][0][0][1][0]
         for l in range(cfg["num_block"])]
    ).astype(jnp.float32)

    w0 = folded["emb0_w"]
    b0 = folded["emb0_b"]
    gt_emb = (ms[:, :, 0, :] @ w0 + b0).astype(jnp.float32)
    main0 = (ms[0][:, 0, :] @ w0 + b0).astype(jnp.float32)

    enc_a = enc_a_steps.astype(ca0.dtype)
    enc_m = enc_mp_steps[:, :, 0, :].astype(cm0.dtype)
    mask_f = sampling_mask.astype(jnp.float32)

    def run(sl):
        return decode_rollout(
            folded,
            ca0[sl],
            cm0[sl],
            h0[:, sl],
            c0[:, sl],
            main0[sl],
            enc_a[:, sl],
            enc_m[:, sl],
            gt_emb[:, sl],
            mask_f,
            heads=heads,
            ratio=ratio,
            len_a0=len_a0,
            len_m0=len_m0,
            bud_m=bud_m,
        )

    batch = ca0.shape[0]
    if not chunk or chunk >= batch:
        ys = run(slice(None))
    else:
        ys = jnp.concatenate(
            [run(slice(i, i + chunk)) for i in range(0, batch, chunk)],
            axis=1,
        )
    return ys.transpose(1, 0, 2)


def generate_metaformer(
    model,
    params,
    batch_data: Tuple[jnp.ndarray, ...],
    sampling_mask: jnp.ndarray,
    cache_dtype=jnp.bfloat16,
    unroll: int = 5,
    kv_layout: str = "shared",
    hoist_encoders="auto",
    fused_rollout="auto",
) -> jnp.ndarray:
    """Rollout for the Metaformer with KV ring-buffer caches.

    hoist_encoders ("auto" | True | False): the other-modality encoders
    (audio, partner motion) depend only on the KNOWN input streams —
    never on the model's own predictions — so in offline generation they
    need not run inside the AR loop at all. The hoisted path computes
    block-0's other-modality encodings for lead+seq in ONE full-sequence
    pass (where the fused Pallas recurrence kernels run at their long-
    sequence speed), then the per-step scan only extends the raw ring
    buffers from the precomputed stream and runs the main-modality
    chain + attend_raw. Exactly the same math — recurrent encoders carry
    state across chunks, so full-sequence == chunked (associativity);
    equality tested in tests/test_generate.py. At the bench workload
    this removes 45 sequential LSTM cells per step (audio 8 frames x 5
    layers + partner motion 5 layers) from the loop body. Measured on
    v5e it is throughput-NEUTRAL (104.9k vs 105.8k frames/s at batch
    16) — XLA was already overlapping the encoder chain with the main
    path, so the step was never waiting on it. The hoist still pays
    structurally: the scan body shrinks to main-chain + attend_raw
    only (no recurrent encoder stacks), which is what makes a future
    fully-fused single-kernel rollout tractable, and the one-shot
    full-sequence encoder pass runs at the Pallas kernels' long-
    sequence speed instead of 8-frame chunks. "auto" hoists whenever
    valid: shared KV layout and no mha other-modality embeddings
    (their ring-buffer visibility would need a banded mask full-
    sequence). Streaming/serving keep the in-loop path (audio arrives
    live there).

    kv_layout="shared" (the INFERENCE DEFAULT since round 3): with
    repeat_with_encoder off, every block's integrators attend the SAME
    block-0 other-modality encodings, so ONE raw ring buffer per other
    modality replaces the 2 x num_block projected-K/V buffers and each
    integrator folds its own projections into the query/output sides
    (TorchMHA.attend_raw — an exact reassociation, k-bias proven to
    cancel in softmax, v-bias restored additively). The decode working
    set shrinks 10x (92 MB -> 9.2 MB bf16 at the production size) and
    stays VMEM-resident: measured on v5e at the bench workload,
      batch 16 bf16:  per_block 43.0k  -> shared 105.8k frames/s/chip
      batch 32 bf16:  shared 72.3k;  batch 64 bf16: shared 75.9k
    (2.46x on the headline; batch 16 stays the single-chip sweet spot —
    past it the per-step attention work grows faster than the step
    amortizes). kv_layout="per_block" keeps the general layout:
    repeat_with_encoder models, int8 quantized caches, and training
    rollouts that must run the exact same ops as the f32 forward.

    cache_dtype=bfloat16 halves the buffer traffic vs f32 (and in the
    per_block layout avoids the f32 VMEM cliff: batch 16 f32 reads
    16.5k vs bf16 41-43k). cache_dtype=int8 (per_block only — the
    scales live in that layout) halves the resident buffers again for
    serving density; ~2^-7 relative K/V error, end-to-end drift bounded
    in tests/test_generate.py. Attention accumulates in f32 in every
    layout. Train-time rollouts (scheduled sampling, generation_eval)
    pin cache_dtype=float32 + kv_layout="per_block" to keep training
    numerics bit-matched to the f32 reference.

    unroll=5 replicates the scan body so XLA overlaps the per-step
    scheduling with compute: 23.1k -> 36.8k frames/s/chip on v5e at the
    bench workload (unroll 10 regresses to 34.1k and compiles 2x longer;
    numerics are unchanged — same ops, same order, per step)."""
    fbank, motion_p, motion_s, lead_a, lead_mp, lead_ms, _ = [
        _zero_padding(x) for x in batch_data
    ]
    cfg = model.cfg
    ratio = mf_sizes(cfg)["ratio"]
    batch = fbank.shape[0]
    fb, mp, ms = _form_steps(fbank, motion_p, motion_s, ratio)

    # warmup: push the leading segment through with caches attached so
    # lead K/V lands in the ring buffers and lstm emb states warm up.
    # Masks stay ON: warmup block outputs feed deeper-block recurrent
    # states, so intra-lead causality matters (the chunk masks are
    # scattered onto the primed cache slots by cache_extend).
    if kv_layout == "shared" and (
        cfg["repeat_with_encoder"] or cache_dtype == jnp.int8
    ):
        # shared layout needs block-0 encoding reuse, and quantized
        # caches carry per-slot scales only in the per-block layout
        kv_layout = "per_block"

    other_types = list(cfg["emb_mixers"])
    other_types.pop(cfg["main_modal_idx"])
    hoistable = kv_layout == "shared" and all(
        t != "mha" for t in other_types
    )
    if hoist_encoders == "auto":
        hoist = hoistable
    else:
        hoist = bool(hoist_encoders)
        if hoist and not hoistable:
            raise ValueError(
                "hoist_encoders=True needs the shared KV layout and "
                "non-mha other-modality embeddings "
                f"(kv_layout={kv_layout!r}, emb types {other_types})"
            )
    if fused_rollout is True and not hoist:
        # the fused kernel consumes the hoisted encodings + shared
        # rings; forcing it on a non-hoistable config must not silently
        # fall back to the scan
        raise ValueError(
            "fused_rollout=True needs the hoisted shared-KV path "
            f"(kv_layout={kv_layout!r}, hoist_encoders={hoist_encoders!r})"
        )

    if hoist:
        # one full-sequence pass over the known input streams produces
        # every other-modality encoding the whole rollout will attend
        full_a = jnp.concatenate([lead_a, fbank], axis=1)
        full_mp = jnp.concatenate([lead_mp, motion_p], axis=1)
        enc_a, enc_mp = model.apply(
            params, full_a, full_mp, None, encode_others_only=True
        )
        la, lm = lead_a.shape[1], lead_mp.shape[1]
        hidden = cfg["hidden_size"]
        steps = motion_s.shape[1]
        enc_a_steps = (
            enc_a[:, la:]
            .reshape(batch, steps, ratio, hidden)
            .transpose(1, 0, 2, 3)
        )
        enc_mp_steps = enc_mp[:, lm:].transpose(1, 0, 2)[:, :, None, :]

        states = _init_metaformer_states(
            cfg, batch, cache_dtype, kv_layout, hoisted=True
        )
        _, states = model.apply(
            params, lead_a, lead_mp, lead_ms, states=states, use_masks=True,
            precomputed_others=[enc_a[:, :la], enc_mp[:, :lm]],
        )

        chunk = _resolve_fused(fused_rollout, cfg, cache_dtype, ratio,
                               batch, la)
        if chunk:
            return _fused_rollout(
                cfg, params, states, enc_a_steps, enc_mp_steps, ms,
                sampling_mask, cache_dtype, la, lm, chunk=chunk,
            )

        def step(carry, xs):
            prev, st = carry
            ea_t, emp_t, ms_t, mask_t = xs
            y, new_st = model.apply(
                params, None, None, prev, states=st, use_masks=False,
                precomputed_others=[ea_t, emp_t],
            )
            nxt = jnp.where(mask_t, y, ms_t)
            return (nxt, new_st), y

        init = (ms[0], states)
        (_, _), ys = jax.lax.scan(
            step, init, (enc_a_steps, enc_mp_steps, ms, sampling_mask),
            unroll=unroll,
        )
        return ys[:, :, 0, :].transpose(1, 0, 2)

    states = _init_metaformer_states(cfg, batch, cache_dtype, kv_layout)
    _, states = model.apply(
        params, lead_a, lead_mp, lead_ms, states=states, use_masks=True
    )

    def step(carry, xs):
        prev, st = carry
        fb_t, mp_t, ms_t, mask_t = xs
        y, new_st = model.apply(
            params, fb_t, mp_t, prev, states=st, use_masks=False
        )
        nxt = jnp.where(mask_t, y, ms_t)
        return (nxt, new_st), y

    init = (ms[0], states)
    (_, _), ys = jax.lax.scan(
        step, init, (fb, mp, ms, sampling_mask), unroll=unroll
    )
    return ys[:, :, 0, :].transpose(1, 0, 2)


def generation_loss(
    prediction: jnp.ndarray, target: jnp.ndarray, lossfun
) -> jnp.ndarray:
    """genrt_loss with -100 masking (reference generation_step :410-424)."""
    mask = (target != PADDING_VALUE).astype(prediction.dtype)
    return lossfun(prediction * mask, target * mask)
