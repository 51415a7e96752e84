"""Device mesh construction and shardings.

Replaces the reference's distributed layer wholesale (SURVEY.md §5.8):
Lightning DDP / torch.distributed / NCCL (trainer.strategy: ddp,
lstmformer/config.yaml:121-127) becomes a jax.sharding Mesh with batch
sharded over a 'data' axis and parameters replicated; XLA inserts the
gradient psum during jit. Multi-host extends via jax.distributed.

Beyond the reference's DP-only scaling, make_mesh_2d + param_sharding
give a ('data', 'model') layout: batch rows over 'data', each parameter's
largest divisible axis over 'model' (Megatron-style weight sharding for
Dense kernels, ZeRO-like for the rest) with GSPMD propagating the
activation shardings and inserting the all-gathers/reduce-scatters.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def make_mesh_2d(
    data: int,
    model: int,
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """(data x model) mesh. 'model' should map to the faster interconnect
    (contiguous devices share an ICI neighborhood), hence it is the
    minor/fastest-varying axis in the device grid."""
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) < data * model:
        raise ValueError(
            f"need {data * model} devices for a {data}x{model} mesh, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names)


_RNN_PARAM_MARKERS = ("weight_ih", "weight_hh", "bias_ih", "bias_hh")


def param_sharding(params, mesh: Mesh, axis: str = "model"):
    """Shard each leaf's largest ``axis``-divisible dim over ``axis``.

    Dense kernels end up Megatron-style column/row-sharded (whichever dim
    is larger); small biases stay replicated. LSTM/GRU gate parameters
    (weight_ih/weight_hh/bias_*) are KEPT REPLICATED: the fused Pallas
    kernels partition over the BATCH dim only (ops/partitioning.py
    custom_partitioning — batch-sharded activations flow through them
    fine), so sharding a gate matrix over 'model' would still force a
    regather at the kernel boundary. Returns a
    pytree of NamedShardings aligned with ``params``; apply with
    jax.device_put / jit in_shardings.
    """
    size = mesh.shape[axis]

    def rule(path, x):
        names = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(m in names for m in _RNN_PARAM_MARKERS):
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
            if x.shape[d] >= size and x.shape[d] % size == 0:
                spec[d] = axis
                break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Host numpy batch pytree -> device arrays sharded on 'data'.

    Every leaf's leading dim must divide the data-axis size; the loaders
    guarantee that via drop_last / batch padding.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def pad_batch_to_devices(batch_np, n_devices: int, pad_value: float):
    """Pad the batch dim so it divides the mesh (masked rows contribute
    nothing to the loss thanks to the -100 loss mask)."""

    def pad(x):
        b = x.shape[0]
        rem = (-b) % n_devices
        if rem == 0:
            return x
        fill = np.full((rem,) + x.shape[1:], pad_value, x.dtype)
        return np.concatenate([x, fill], axis=0)

    return jax.tree_util.tree_map(pad, batch_np)
