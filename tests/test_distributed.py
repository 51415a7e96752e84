"""Multi-host helpers on the 8-device virtual CPU mesh (single process:
process-local == global, which make_array_from_process_local_data must
handle as the degenerate case)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.parallel.distributed import (
    global_data_mesh,
    host_local_batch_to_global,
    initialize_multihost,
)


def test_initialize_multihost_single_process_noop(monkeypatch):
    # must not try to reach a coordinator when there is nothing to join
    def boom(**kw):
        raise AssertionError("initialize() must not be called")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    initialize_multihost()  # env default: 1 process
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    initialize_multihost()


def test_initialize_multihost_joins_when_configured(monkeypatch):
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    initialize_multihost("10.0.0.1:1234", num_processes=4, process_id=2)
    assert calls == [
        dict(
            coordinator_address="10.0.0.1:1234",
            num_processes=4,
            process_id=2,
        )
    ]


def test_global_data_mesh_shapes():
    mesh = global_data_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (8,)
    mesh2 = global_data_mesh(("data", "model"))
    assert mesh2.devices.shape == (8, 1)


def test_host_local_batch_to_global_roundtrip():
    mesh = global_data_mesh()
    batch = {
        "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "lens": np.arange(8, dtype=np.int32),
    }
    g = host_local_batch_to_global(mesh, batch)
    assert g["x"].shape == (8, 3)
    assert len(g["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
    np.testing.assert_array_equal(np.asarray(g["lens"]), batch["lens"])


def test_global_batch_feeds_jitted_reduction():
    mesh = global_data_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    g = host_local_batch_to_global(mesh, x)
    # XLA inserts the cross-device reduction for the sharded input
    total = jax.jit(lambda a: jnp.sum(a))(g)
    assert float(total) == float(x.sum())
