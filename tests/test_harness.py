"""Training harness: loss goes down on synthetic data; 8-device mesh works."""

import jax
import numpy as np
import pytest

from multimodalreactiongeneration_tpu.data.databuild_nx import DataBuilderNX
from multimodalreactiongeneration_tpu.data.dataset import (
    BatchLoader,
    SegmentDatasetNX,
    random_split_indices,
)
from multimodalreactiongeneration_tpu.models.lstm_with_sampling import LSTMwithSample
from multimodalreactiongeneration_tpu.parallel.mesh import make_mesh
from multimodalreactiongeneration_tpu.train.harness import (
    Trainer,
    streaming_step_fns,
)
from multimodalreactiongeneration_tpu.train.optim import build_optimizer
from multimodalreactiongeneration_tpu.utils.config import from_dict
from tests.fixtures import AUDIO_CFG, DATA_CFG, MOTION_CFG, make_synthetic_corpus
from tests.test_streaming_models import LWS_CFG


pytestmark = pytest.mark.slow
OPTIM = from_dict(
    dict(
        use_optimizer="adam",
        momentum=0.9,
        weight_decay=1e-2,
        lr=1e-3,
        use_lr_sched=True,
        batch_size=2,
        max_epochs=4,
    )
)

LWS_MODEL_CFG = dict(LWS_CFG, loss_type="huber", loss_reduction="mean",
                     huber_delta=1.0, delta_loss_scale=1.0)


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus2")
    corpus = make_synthetic_corpus(str(root), n_sessions=2, seconds=90.0)
    cache = tmp_path_factory.mktemp("cache2")
    builder = DataBuilderNX(dict(DATA_CFG, data_dir=corpus), cache_root=str(cache))
    ds = SegmentDatasetNX(builder.data_site, MOTION_CFG, AUDIO_CFG)
    n = len(ds)
    tr, va, _ = random_split_indices(n, 0.5, 0.25, seed=0)
    mk = lambda idx: BatchLoader(ds, idx, batch_size=2, seed=0)
    return mk(tr), mk(va), ds


def test_fit_reduces_loss(loaders, tmp_path):
    train_loader, val_loader, _ = loaders
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    batch = next(iter(train_loader))
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])

    optimizer = build_optimizer(OPTIM)
    train_step, eval_step = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer, mask_self_motion_input=False
    )
    trainer = Trainer(
        model,
        train_step,
        eval_step,
        optimizer,
        OPTIM,
        callbacks_cfg=dict(save_top_k=2, use_checkpoint=True,
                           use_early_stopping=False, patience_epoch=10),
        log_dir=str(tmp_path / "log"),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    params, result = trainer.fit(params, train_loader, val_loader, max_epochs=3)
    assert result.epochs_run == 3
    losses = [h["train_loss"] for h in result.history]
    assert losses[-1] < losses[0]  # learning something
    assert np.isfinite(result.best_val_loss)
    # checkpoints exist: top-k + last
    import os

    entries = os.listdir(tmp_path / "ckpt")
    assert "last" in entries and any(e.startswith("V") for e in entries)
    # metrics logged with per-slice MSE keys
    assert "train_angle" in result.history[0]
    assert "valid_delta2-centroid" in result.history[0]
    # per-epoch throughput record (epoch_bench reads these): real
    # unpadded frames = sum of the target lengths across train batches
    expect_frames = sum(
        int(np.asarray(b[-1][1]).sum()) for b in train_loader
    )
    rec = result.history[0]
    assert rec["train_frames"] == expect_frames > 0
    assert rec["train_frames_per_s"] > 0
    assert 0 < rec["train_seconds"] <= rec["epoch_seconds"]


def test_fit_without_val_batches_skips_v_checkpoints(loaders, tmp_path):
    """Empty val loader -> val_loss is NaN: the V monitor must not fire
    (no V{epoch}-nan dirs) and early stopping must not trigger
    (Lightning ModelCheckpoint/EarlyStopping semantics)."""
    import os

    train_loader, _, ds = loaders
    empty_val = BatchLoader(ds, [], batch_size=2, seed=0)
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    batch = next(iter(train_loader))
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])

    optimizer = build_optimizer(OPTIM)
    train_step, eval_step = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer, mask_self_motion_input=False
    )
    trainer = Trainer(
        model,
        train_step,
        eval_step,
        optimizer,
        OPTIM,
        callbacks_cfg=dict(save_top_k=2, use_checkpoint=True,
                           use_early_stopping=True, patience_epoch=0),
        log_dir=str(tmp_path / "log"),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    params, result = trainer.fit(params, train_loader, empty_val, max_epochs=2)
    assert result.epochs_run == 2  # NaN val must not early-stop
    entries = os.listdir(tmp_path / "ckpt")
    assert "last" in entries
    assert not any(e.startswith("V") for e in entries)


def test_multi_device_mesh_train_step(loaders):
    train_loader, _, _ = loaders
    mesh = make_mesh()  # 8 virtual CPU devices from conftest
    assert mesh.devices.size == 8

    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    # batch of 8 so it splits evenly over the mesh
    samples = []
    for batch in train_loader:
        pass
    loader8 = BatchLoader(
        train_loader.dataset, np.arange(len(train_loader.dataset)),
        batch_size=8, seed=0,
    )
    batch = next(iter(loader8))
    if batch[0][0].shape[0] < 8:
        pytest.skip("not enough segments for an 8-row batch")
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
    optimizer = build_optimizer(OPTIM)
    train_step, _ = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer, mask_self_motion_input=False
    )
    trainer = Trainer(
        model, train_step, None, optimizer, OPTIM, mesh=mesh, log_dir="/tmp/mlog"
    )
    staged = trainer._stage(batch)
    # batch rows sharded over 'data'
    assert len(staged[0][0].sharding.device_set) == 8
    opt_state = jax.jit(optimizer.init)(params)
    p2, _, loss, _ = trainer._train_step(
        params, opt_state, staged, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))


def test_bf16_compute_step(loaders):
    import jax.numpy as jnp

    train_loader, _, _ = loaders
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    batch = next(iter(train_loader))
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
    optimizer = build_optimizer(OPTIM)
    train_step, _ = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer,
        mask_self_motion_input=False, compute_dtype=jnp.bfloat16,
    )
    opt_state = jax.jit(optimizer.init)(params)
    p2, _, loss, _ = jax.jit(train_step)(
        params, opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    # params stay f32 in the optimizer
    leaf = jax.tree_util.tree_leaves(p2)[0]
    assert leaf.dtype == jnp.float32


def test_remat_step_matches_plain(loaders):
    train_loader, _, _ = loaders
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    batch = next(iter(train_loader))
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
    optimizer = build_optimizer(OPTIM)
    plain, _ = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer, mask_self_motion_input=False
    )
    remat, _ = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer,
        mask_self_motion_input=False, remat=True,
    )
    st = jax.jit(optimizer.init)(params)
    p1, _, l1, _ = jax.jit(plain)(params, st, batch, jax.random.PRNGKey(1))
    st2 = jax.jit(optimizer.init)(params)
    p2, _, l2, _ = jax.jit(remat)(params, st2, batch, jax.random.PRNGKey(1))
    assert abs(float(l1) - float(l2)) < 1e-6
    a = jax.tree_util.tree_leaves(p1)[0]
    b = jax.tree_util.tree_leaves(p2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resume_restores_optimizer_state(tmp_path, loaders):
    from multimodalreactiongeneration_tpu.train.checkpoint import (
        TopKCheckpointer,
        load_checkpoint,
        restore_opt_state,
    )

    train_loader, _, _ = loaders
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    batch = next(iter(train_loader))
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
    optimizer = build_optimizer(OPTIM)
    train_step, _ = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer, mask_self_motion_input=False
    )
    st = jax.jit(optimizer.init)(params)
    params, st, _, _ = jax.jit(train_step)(params, st, batch, jax.random.PRNGKey(1))

    saver = TopKCheckpointer(str(tmp_path / "ck"), top_k=1)
    saver.maybe_save(params, st, epoch=0, val_loss=0.5)
    payload = load_checkpoint(saver.best_path())
    restored = restore_opt_state(payload, optimizer, payload["params"])
    assert restored is not None
    # adam moments survive the round trip
    a = jax.tree_util.tree_leaves(st)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # and training continues from the restored state without error
    p2, st2, loss, _ = jax.jit(train_step)(
        payload["params"], restored, batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))


def test_topk_checkpointer_reseeds_from_existing_dir(tmp_path):
    """Resuming into a populated ckpt_dir must see the prior run's top-k.

    Regression: _saved started empty on construction, so a resumed run
    never compared against or pruned previous checkpoints and best_path()
    ignored them.
    """
    from multimodalreactiongeneration_tpu.train.checkpoint import (
        TopKCheckpointer,
    )

    import os

    import jax.numpy as jnp

    params = {"w": jnp.ones((2, 2))}
    first = TopKCheckpointer(str(tmp_path / "ck"), top_k=2)
    first.maybe_save(params, None, epoch=0, val_loss=0.8)
    first.maybe_save(params, None, epoch=1, val_loss=0.4)

    resumed = TopKCheckpointer(str(tmp_path / "ck"), top_k=2)
    assert resumed.best_path() == first.best_path()
    # worse than the existing worst: rejected
    assert not resumed.maybe_save(params, None, epoch=2, val_loss=0.9)
    # better: accepted, and the stale worst (V0-0.8) is pruned from disk
    assert resumed.maybe_save(params, None, epoch=3, val_loss=0.2)
    names = sorted(os.listdir(tmp_path / "ck"))
    assert names == ["V1-0.400000", "V3-0.200000"]


def test_2d_mesh_sharded_train_step(loaders):
    """(data x model) mesh: params sharded on their largest axis over
    'model', batch over 'data'; loss matches the replicated step."""
    import jax.numpy as jnp

    from multimodalreactiongeneration_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh_2d,
        param_sharding,
    )

    train_loader, _, _ = loaders
    mesh = make_mesh_2d(2, 4)
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    loader8 = BatchLoader(
        train_loader.dataset, np.arange(len(train_loader.dataset)),
        batch_size=8, seed=0,
    )
    batch = next(iter(loader8))
    if batch[0][0].shape[0] < 8:
        pytest.skip("not enough segments for an 8-row batch")
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
    optimizer = build_optimizer(OPTIM)
    train_step, _ = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer, mask_self_motion_input=False
    )
    # replicated single-device reference loss
    st0 = jax.jit(optimizer.init)(params)
    _, _, ref_loss, _ = jax.jit(train_step)(
        params, st0, batch, jax.random.PRNGKey(1)
    )

    pshard = param_sharding(params, mesh)
    sharded = jax.device_put(params, pshard)
    # big 2D kernels actually split over 'model'
    leaves = jax.tree_util.tree_leaves(sharded)
    assert any(
        len(x.sharding.device_set) == 8 and x.ndim >= 2 for x in leaves
    )
    st = jax.jit(optimizer.init)(sharded)
    staged = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), batch_sharding(mesh)), batch
    )
    p2, _, loss, _ = jax.jit(train_step)(
        sharded, st, staged, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
    # updated params keep their sharding (no silent full replication)
    big = [
        x for x in jax.tree_util.tree_leaves(p2)
        if x.ndim >= 2 and max(x.shape) % 4 == 0 and max(x.shape) >= 4
    ]
    assert any(not x.sharding.is_fully_replicated for x in big)


def test_training_is_deterministic(loaders, tmp_path):
    """SURVEY §5.2: determinism is the race-detection substitute. Two
    fits from the same seed must produce bit-identical loss history."""

    def one_fit(tag):
        # fresh loaders: BatchLoader advances its epoch counter per pass,
        # so reusing the module fixture would change the shuffles
        _, _, ds = loaders
        tr, va, _te = random_split_indices(len(ds), 0.5, 0.25, seed=0)
        train_loader = BatchLoader(ds, tr, batch_size=2, seed=0)
        val_loader = BatchLoader(ds, va, batch_size=2, seed=0)
        model = LSTMwithSample(cfg=LWS_MODEL_CFG)
        batch = next(iter(BatchLoader(ds, tr, batch_size=2, seed=0)))
        data = [b[0] for b in batch]
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
        optimizer = build_optimizer(OPTIM)
        train_step, eval_step = streaming_step_fns(
            model, LWS_MODEL_CFG, MOTION_CFG, optimizer,
            mask_self_motion_input=False,
        )
        trainer = Trainer(
            model, train_step, eval_step, optimizer, OPTIM,
            callbacks_cfg=dict(use_checkpoint=False,
                               use_early_stopping=False),
            log_dir=str(tmp_path / f"log_{tag}"),
            seed=123,
        )
        _, result = trainer.fit(params, train_loader, val_loader,
                                max_epochs=2)
        return [(h["train_loss"], h["val_loss"]) for h in result.history]

    assert one_fit("a") == one_fit("b")


def test_windowed_loss_masks_stage_filler_rows():
    """Rows appended by Trainer._stage (-100 filler) must contribute
    nothing to the windowed loss numerator (reference semantics: mask
    both sides, full-tensor-mean denominator)."""
    import jax.numpy as jnp

    from multimodalreactiongeneration_tpu.models.simple_lstm import (
        simple_lstm_loss,
    )

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 1, 18)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 1, 18)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(2, 4, 18)).astype(np.float32))
    cfg = {"all_static": False, "delta_loss_scale": 1.0}
    mcfg = {"use_centroid": True, "use_angle": True, "delta_order": 2}
    base, _ = simple_lstm_loss(y, t, motion, cfg, mcfg)

    pad = jnp.full((1, 1, 18), -100.0)
    y2 = jnp.concatenate([y, jnp.asarray(rng.normal(size=(1, 1, 18)),
                                         jnp.float32)])
    t2 = jnp.concatenate([t, pad])
    motion2 = jnp.concatenate([motion, jnp.full((1, 4, 18), -100.0)])
    mask = (~jnp.all(t2 == -100.0, axis=(1, 2))).reshape(-1, 1, 1)
    masked, _ = simple_lstm_loss(y2, t2, motion2, cfg, mcfg, row_mask=mask)
    # filler contributes 0 to the numerator; denominator grows 2 -> 3
    np.testing.assert_allclose(float(masked), float(base) * 2 / 3, rtol=1e-5)


def test_async_checkpointing_matches_sync(loaders, tmp_path):
    """async_checkpoint=true overlaps saves with the next epoch; the
    on-disk result (top-k pruning, last, restorable payloads) must be
    indistinguishable from the synchronous saver."""
    import os

    from multimodalreactiongeneration_tpu.train.checkpoint import (
        load_checkpoint,
    )

    train_loader, _, ds = loaders
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    batch = next(iter(train_loader))
    data = [b[0] for b in batch]
    optimizer = build_optimizer(OPTIM)
    train_step, eval_step = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer,
        mask_self_motion_input=False,
    )
    n = len(ds)
    tr, va, _ = random_split_indices(n, 0.5, 0.25, seed=0)

    def run(async_flag, sub):
        # fresh same-seed params AND loaders per run: the train step
        # DONATES params, and BatchLoader shuffle state advances per
        # epoch — both must restart for bit-identical fits
        params0 = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
        trainer = Trainer(
            model, train_step, eval_step, optimizer, OPTIM,
            callbacks_cfg=dict(save_top_k=1, use_checkpoint=True,
                               use_early_stopping=False, patience_epoch=10,
                               async_checkpoint=async_flag),
            log_dir=str(tmp_path / f"log{sub}"),
            ckpt_dir=str(tmp_path / f"ckpt{sub}"),
        )
        _, result = trainer.fit(
            params0,
            BatchLoader(ds, tr, batch_size=2, seed=0),
            BatchLoader(ds, va, batch_size=2, seed=0),
            max_epochs=3,
        )
        return sorted(os.listdir(tmp_path / f"ckpt{sub}")), result

    entries_sync, res_sync = run(False, "s")
    entries_async, res_async = run(True, "a")
    # same dirs (deterministic same-seed fits -> same V names) and the
    # async fit's losses match the sync fit bit-for-bit
    assert entries_async == entries_sync
    for ha, hs in zip(res_async.history, res_sync.history):
        assert ha["val_loss"] == hs["val_loss"]
    # payload written by the async saver restores and matches the
    # sync-saved one
    pa = load_checkpoint(str(tmp_path / "ckpta" / "last"))
    ps = load_checkpoint(str(tmp_path / "ckpts" / "last"))
    la = jax.tree_util.tree_leaves(pa["params"])
    ls = jax.tree_util.tree_leaves(ps["params"])
    assert len(la) == len(ls)
    for a, b in zip(la, ls):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert pa["epoch"] == ps["epoch"] == 2


def test_save_opt_state_last_mode(loaders, tmp_path):
    """callbacks.save_opt_state default ("last"): top-k monitor files
    carry params only (the ~2/3 adam-state transfer is skipped); `last`
    keeps the full payload so resume is lossless."""
    from multimodalreactiongeneration_tpu.train.checkpoint import (
        load_checkpoint,
        restore_opt_state,
    )

    train_loader, val_loader, _ = loaders
    model = LSTMwithSample(cfg=LWS_MODEL_CFG)
    batch = next(iter(train_loader))
    data = [b[0] for b in batch]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *data[:6])
    optimizer = build_optimizer(OPTIM)
    train_step, eval_step = streaming_step_fns(
        model, LWS_MODEL_CFG, MOTION_CFG, optimizer,
        mask_self_motion_input=False,
    )
    trainer = Trainer(
        model, train_step, eval_step, optimizer, OPTIM,
        callbacks_cfg=dict(save_top_k=2, use_checkpoint=True,
                           use_early_stopping=False, patience_epoch=10),
        log_dir=str(tmp_path / "log"),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    params, result = trainer.fit(
        params, train_loader, val_loader, max_epochs=2
    )
    import os

    entries = os.listdir(tmp_path / "ckpt")
    v_files = [e for e in entries if e.startswith("V")]
    assert v_files and "last" in entries
    top = load_checkpoint(str(tmp_path / "ckpt" / v_files[0]))
    assert top.get("opt_leaves") is None  # params-only monitor file
    assert "params" in top
    last = load_checkpoint(str(tmp_path / "ckpt" / "last"))
    assert last.get("opt_leaves") is not None  # full resume payload
    restored = restore_opt_state(last, optimizer, last["params"])
    assert restored is not None
    # restore from a params-only top-k file degrades gracefully
    assert restore_opt_state(top, optimizer, top["params"]) is None
