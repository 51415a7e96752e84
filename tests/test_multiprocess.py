"""REAL multi-process multi-host training (no mocks).

The reference trains multi-process by construction: Lightning DDP spawns
one process per device over NCCL (trainer.strategy: ddp,
/root/reference/mr_gen/model/lstmformer/config.yaml:121,127). These tests
run the TPU-native replacement with genuinely separate OS processes:
2 workers x 4 virtual CPU devices each, joined through a live
``jax.distributed.initialize`` coordinator with gloo cross-process
collectives. Every line of parallel/distributed.py and the
``make_array_from_process_local_data`` branch of ``Trainer._stage``
executes for real here (tests/test_distributed.py covers the
single-process degenerate case and plumbing).
"""

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.parallel.multihost_dryrun import (
    verify_multihost,
)

pytestmark = [pytest.mark.multiprocess, pytest.mark.slow]


def test_two_process_train_step_matches_single_process():
    # one full sharded train step, 2 processes x 4 devices vs 1 process
    # x 8 devices; HostRowShard permutes rows across hosts but the loss
    # is a batch mean, so the values must agree exactly (f32 tolerance)
    single, multi = verify_multihost(num_processes=2, local_devices=4)
    assert sorted(multi) == [0, 1]
    for loss in multi.values():
        assert np.isfinite(loss)
        assert abs(loss - single) < 1e-4
    # ranks must agree with each other bit-for-bit (same SPMD program)
    losses = list(multi.values())
    assert abs(losses[0] - losses[1]) < 1e-6
    # cross-check against the historical dryrun constant so a silent
    # change to the dryrun model/batch construction can't hide a
    # collective bug behind "both paths changed the same way"
    assert abs(single - 0.60253) < 1e-3


def test_two_process_full_fit_matches_single_process(tmp_path):
    """A FULL 2-epoch Trainer.fit (staging, val evals, rank-0 checkpoint
    + metrics writing) across 2 real coordinated processes must produce
    the same per-epoch val-loss history as a single 8-device process."""
    from multimodalreactiongeneration_tpu.parallel.multihost_dryrun import (
        launch_multihost_fit,
    )

    single = launch_multihost_fit(
        str(tmp_path / "ck1"), num_processes=1, local_devices=8
    )[0]
    multi = launch_multihost_fit(
        str(tmp_path / "ck2"), num_processes=2, local_devices=4
    )
    single_vals, single_ckpts = single
    assert len(single_vals) == 2
    assert single_ckpts >= 1  # V checkpoint (+ last)
    for rank, (vals, n_ckpts) in multi.items():
        assert len(vals) == 2
        for a, b in zip(vals, single_vals):
            assert abs(a - b) < 1e-4, (rank, vals, single_vals)
        # rank 0 wrote; rank 1 sees the same shared dir (same count) —
        # a double-writer would have corrupted or duplicated entries
        assert n_ckpts == single_ckpts
