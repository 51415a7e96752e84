"""Packed device->host pytree transfers (train/checkpoint.py).

The checkpoint path snapshots pytrees as one device buffer per dtype
(remote runtimes pay a round trip per array: 340 leaves cost ~7x one
same-sized buffer, measured 2026-08-20) and rebuilds owned host numpy
leaves. These tests pin reconstruction exactness, dtype grouping,
non-array passthrough, and the shared-snapshot single-fetch contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.train import checkpoint as ckpt_lib


def _tree():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return {
        "a": jax.random.normal(ks[0], (3, 5)),
        "nested": {
            "b": jax.random.normal(ks[1], (7,)),
            "c": jnp.arange(6, dtype=jnp.int32).reshape(2, 3),
        },
        "d": jax.random.normal(ks[2], (1, 2, 4)).astype(jnp.bfloat16),
        "scalar": jnp.int32(9),
        "host": np.float64(1.5),  # non-jax leaf passes through
    }


def test_fetch_tree_reconstructs_exactly():
    tree = _tree()
    out = ckpt_lib.fetch_tree(tree)
    ref = jax.tree_util.tree_map(np.asarray, tree)
    flat_o, def_o = jax.tree_util.tree_flatten(out)
    flat_r, def_r = jax.tree_util.tree_flatten(ref)
    assert def_o == def_r
    for o, r in zip(flat_o, flat_r):
        assert isinstance(o, np.ndarray) or np.isscalar(o)
        assert np.asarray(o).dtype == np.asarray(r).dtype
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_fetched_leaves_are_owned_host_copies():
    tree = {"w": jnp.ones((4, 4))}
    out = ckpt_lib.fetch_tree(tree)
    # owned: mutating the fetched array must not require the device
    # buffer to stay alive, and the array owns (or views only host) data
    out["w"][0, 0] = 42.0
    assert out["w"][0, 0] == 42.0


def test_device_snapshot_fetches_once_and_is_shared():
    calls = {"n": 0}
    orig = ckpt_lib._unpack_host

    def counting(*args, **kw):
        calls["n"] += 1
        return orig(*args, **kw)

    snap = ckpt_lib.DeviceSnapshot({"w": jnp.ones((8,))}, None)
    ckpt_lib._unpack_host = counting
    try:
        p1 = snap.host_payload()
        p2 = snap.host_payload()
    finally:
        ckpt_lib._unpack_host = orig
    assert calls["n"] == 1 and p1 is p2
    np.testing.assert_array_equal(p1["params"]["w"], np.ones((8,)))


def test_snapshot_survives_donated_source_buffers():
    """The packed snapshot must not reference the source buffers: after
    a donating jit consumes them, the fetch still returns the ORIGINAL
    values (the trainer donates params into the next train step while a
    background save is in flight)."""
    x = jnp.full((256,), 3.0)
    snap = ckpt_lib.DeviceSnapshot({"w": x}, None)
    donate_c = jax.jit(lambda v: v * 0.0, donate_argnums=(0,))
    _ = donate_c(x)  # x's buffer is donated away (no-op on CPU backends,
    # where donation is unsupported — the real protection matters on TPU)
    out = snap.host_payload()
    np.testing.assert_array_equal(out["params"]["w"], np.full((256,), 3.0))
