"""Sharded batched multi-dialog decode over the device mesh
(BASELINE config #3 at multi-chip scale): the AR scan jits with the
dialog batch sharded on 'data'; per-dialog state (LSTM carries, KV ring
buffers) shards along its batch dim automatically."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.infer.generate import (
    generate_metaformer,
    sampling_mask_for,
)
from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from multimodalreactiongeneration_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)
from tests.test_streaming_models import MF_CFG



pytestmark = pytest.mark.slow
def test_decode_shards_over_mesh():
    mesh = make_mesh()
    assert mesh.devices.size == 8

    model = Metaformer(cfg=MF_CFG)
    T, lead, ratio, B = 6, 2, 8, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    batch = (
        jax.random.normal(ks[0], (B, T * ratio, 81)),
        jax.random.normal(ks[1], (B, T, 18)),
        jax.random.normal(ks[2], (B, T, 18)),
        jax.random.normal(ks[3], (B, lead * ratio, 81)),
        jax.random.normal(ks[4], (B, lead, 18)),
        jax.random.normal(ks[5], (B, lead, 18)),
        jax.random.normal(ks[6], (B, T, 18)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *batch[:6])

    mask = sampling_mask_for(T, "full")
    # f32 KV: this test asserts SHARDING equivalence; the bf16 inference
    # default rounds cache writes differently across program partitions
    # and the free-run feedback amplifies those ULPs past any tight tol
    decode = jax.jit(
        lambda p, b: generate_metaformer(
            model, p, b, mask, cache_dtype=jnp.float32
        )
    )

    # unsharded reference
    ref = decode(params, batch)

    # shard dialogs over the mesh
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    params_r = jax.device_put(params, rep)
    batch_s = tuple(jax.device_put(x, bsh) for x in batch)
    out = decode(params_r, batch_s)
    assert len(out.sharding.device_set) == 8  # stayed sharded
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
