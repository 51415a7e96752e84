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
        # (reference G{epoch}-{genrt_loss}); keep it on f32 KV and the
        # per-block layout so its value is independent of the bf16
        # shared-KV inference default (per_block runs the exact same ops
        # as the training forward — attend_raw reassociates)
        gen = functools.partial(
            generate_metaformer,
            cache_dtype=jnp.float32,
            kv_layout="per_block",
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
