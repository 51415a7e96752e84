"""Validation-time generation evaluation (genrt_loss).

Reference validation_step runs a full autoregressive generation pass and
logs genrt_loss besides val_loss (lstmformer.py:387-424,
lstm_with_sample.py:303-337). Here the rollout is the jitted scan engine;
one compiled program per padded shape.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.infer.generate import (
    generate_lws,
    generate_metaformer,
    generation_loss,
    sampling_mask_for,
)
from multimodalreactiongeneration_tpu.train.losses import build_loss


def make_generation_eval(model, model_type: str, model_cfg) -> Callable:
    lossfun = build_loss(model_cfg)
    if model_type == "lstm_with_sampling":
        gen = generate_lws
    else:
        # genrt_loss is a VALIDATION metric monitored for checkpoints
        # (reference G{epoch}-{genrt_loss}); f32 caches keep its value
        # off the bf16 inference default's rounding. The SHARED raw-KV
        # layout (projections folded into query/output sides) replaced
        # per_block in round 4: it reassociates the attends (~2.5e-4
        # relative shift in the metric, internally consistent across
        # epochs) but compiles 5x faster (54 s vs 293 s cold, 2 val
        # shapes) and runs each eval pass 2.5x faster (80 ms vs 200 ms
        # at B16, measured 2026-08-20) — with 4 validation checks per
        # epoch (val_check_interval 0.25) that cost is paid every epoch.
        gen = functools.partial(
            generate_metaformer,
            cache_dtype=jnp.float32,
            kv_layout="shared",
        )

    @jax.jit
    def _one(params, data):
        pred = gen(model, params, data, sampling_mask_for(data[1].shape[1], "full"))
        return generation_loss(pred, data[-1], lossfun)

    def generation_eval(params, val_loader) -> float:
        losses = []
        for batch in val_loader:
            # batch leaves may already be device arrays (device-resident
            # collate) — hand them to the jit as-is; one stacked sync at
            # the end instead of a per-batch float() round trip
            data = tuple(b[0] for b in batch)
            losses.append(_one(params, data))
        if not losses:
            return float("nan")
        return float(np.asarray(jnp.stack(losses)).mean())

    return generation_eval
