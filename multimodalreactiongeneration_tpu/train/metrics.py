"""Per-feature-slice MSE metrics (reference multi_modal_metrics.py:6-56).

gen_target_dict reproduces the slice layout shared by all three reference
models (simple_lstm.py:15-45, lstm_with_sample.py:26-56, lstmformer.py:37-67):
centroid/angle plus delta1/delta2 slices keyed by feature ranges.

The torchmetrics MetricCollection becomes a pure function returning
(sum_sq_err, count) pairs so the accumulation works inside jit and across
devices (psum-able), plus a tiny host-side accumulator for epoch means.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def gen_target_dict(
    use_centroid: bool, use_angle: bool, delta_order: int
) -> Dict[str, Tuple[int, int]]:
    target = {"centroid": (0, 3), "angle": (3, 6)}
    tail = 6
    if not use_centroid:
        target.pop("centroid")
        target["angle"] = (0, 3)
        tail = 3
    elif not use_angle:
        target.pop("angle")
        tail = 3
    if delta_order > 0:
        if use_centroid:
            target["delta1-centroid"] = (tail, tail + 3)
            tail += 3
        if use_angle:
            target["delta1-angle"] = (tail, tail + 3)
            tail += 3
    if delta_order > 1:
        if use_centroid:
            target["delta2-centroid"] = (tail, tail + 3)
            tail += 3
        if use_angle:
            target["delta2-angle"] = (tail, tail + 3)
            tail += 3
    return target


def per_slice_sq_err(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    target_dict: Dict[str, Tuple[int, int]],
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """(..., D) pred/target -> {name: (sum_sq_err, element_count)}.

    Equivalent to SeparateMeanSquaredError.update on each slice
    (multi_modal_metrics.py:18-33); divide sum by count for the MSE.
    """
    out = {}
    for name, (start, end) in target_dict.items():
        diff = preds[..., start:end] - target[..., start:end]
        out[name] = (
            jnp.sum(jnp.square(diff)),
            jnp.asarray(diff.size, jnp.float32),
        )
    return out


class MetricAccumulator:
    """Host-side epoch accumulator with train_/valid_/genrt_ prefixes."""

    def __init__(self, prefix: str = ""):
        self.prefix = prefix
        self.reset()

    def reset(self) -> None:
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, float] = {}

    def update(self, slice_errs: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]):
        for name, (s, c) in slice_errs.items():
            self._sums[name] = self._sums.get(name, 0.0) + float(s)
            self._counts[name] = self._counts.get(name, 0.0) + float(c)

    def compute(self) -> Dict[str, float]:
        return {
            f"{self.prefix}{name}": self._sums[name] / max(self._counts[name], 1.0)
            for name in self._sums
        }
