"""The ablation probe's baseline variant must BE the production kernel.

benchmarks/stacked_kernel_probe.py carries a copy of the wavefront
forward with ablation hooks (the production kernel stays unpolluted).
Its conclusions only hold if the un-ablated copy computes exactly what
ops/pallas_lstm_stacked.py computes — pin that here so a kernel change
that isn't mirrored into the probe fails loudly instead of silently
invalidating recorded studies.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def test_probe_full_variant_matches_production_kernel():
    from benchmarks.stacked_kernel_probe import make_fwd
    from multimodalreactiongeneration_tpu.ops import pallas_lstm_stacked as k

    b, t, h, L = 3, 21, 16, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    s_pad = k._slot_pad_len(t, L)
    xw0 = jax.random.normal(ks[0], (b, t, 4 * h)) * 0.5
    xw0s = k._pad_slots(xw0, 1, s_pad)
    w_ih_t = jax.random.normal(ks[1], (L - 1, h, 4 * h)) * 0.2
    b_rest = jax.random.normal(ks[2], (L - 1, 4 * h)) * 0.1
    w_hh_t = jax.random.normal(ks[3], (L, h, 4 * h)) * 0.2
    h0 = jax.random.normal(ks[4], (b, L, h)) * 0.1
    c0 = jax.random.normal(ks[5], (b, L, h)) * 0.1
    args = (xw0s, w_ih_t, b_rest, w_hh_t, h0, c0)

    probe = make_fwd(t, cheap_act=False, no_store=False)(*args)
    prod = k._make_fwd(t)(*args)
    for name, a, e in zip(("hs", "cs", "gs", "hn", "cn"), probe, prod):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(e), err_msg=name
        )

    # the ablated variants must still run and keep the final-state
    # contract shapes (their numerics are intentionally invalid)
    for cheap, nostore in ((True, False), (False, True), (True, True)):
        outs = make_fwd(t, cheap_act=cheap, no_store=nostore)(*args)
        assert outs[3].shape == (b, L, h) and outs[4].shape == (b, L, h)
        assert np.isfinite(np.asarray(outs[3])).all()
