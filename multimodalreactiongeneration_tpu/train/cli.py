"""Training CLI: the reference's per-model trainer entry points.

Usage (mirrors run/*/train.sh contracts, e.g. run/lstmformer/train.sh:1-9):

    python -m multimodalreactiongeneration_tpu.train.cli \
        --config configs/lstmformer.yaml \
        name=exp-01 data_dir=/path/corpus ckpt_path=./ckpts log_dir=./log

Replaces trainer.py x3 (Hydra main + WandbLogger + ModelCheckpoint +
EarlyStopping, reference model/*/trainer.py) with one dispatcher keyed on
exp.use_model.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

from multimodalreactiongeneration_tpu.models import build_model
from multimodalreactiongeneration_tpu.train.harness import (
    Trainer,
    streaming_step_fns,
    windowed_step_fns,
)
from multimodalreactiongeneration_tpu.train.optim import build_optimizer
from multimodalreactiongeneration_tpu.utils.config import load_config
from multimodalreactiongeneration_tpu.utils.logging import set_logger


def make_streaming_loaders(cfg, logger):
    from multimodalreactiongeneration_tpu.data.databuild_nx import DataBuilderNX
    from multimodalreactiongeneration_tpu.data.dataset import (
        BatchLoader,
        PrefetchLoader,
        SegmentDatasetNX,
        random_split_indices,
    )

    builder = DataBuilderNX(cfg.data, logger)
    dataset = SegmentDatasetNX(builder.data_site, cfg.motion, cfg.audio)
    assert len(dataset) != 0, "dataset is empty"
    tr, va, te = random_split_indices(
        len(dataset), cfg.exp.train_rate, cfg.exp.valid_rate, seed=cfg.get("seed", 0)
    )
    logger.info(
        f"train size: {len(tr)}, valid size: {len(va)}, test size: {len(te)}"
    )
    pad = cfg.trainer.get("pad_to_multiple", 16)
    bs = cfg.exp.batch_size
    # prefetch_batches=0 falls back to synchronous in-loop loading
    depth = int(cfg.trainer.get("prefetch_batches", 2))

    # HBM-resident corpus audio: upload wavs once, gather slices on
    # device per batch (data/audio_cache.py). Auto-disabled when the
    # bank would exceed the budget; cache_audio_mb=0 turns it off.
    audio_cache = None
    cache_mb = float(cfg.trainer.get("cache_audio_mb", 1024))
    if cache_mb > 0:
        from multimodalreactiongeneration_tpu.data.audio_cache import (
            DeviceAudioCache,
        )

        audio_cache = DeviceAudioCache.build_for_dataset(
            dataset, cfg.audio.to_dict(), pad, ratio=8,
            budget_bytes=int(cache_mb * 1e6),
        )
        if audio_cache is not None:
            logger.info(
                f"audio cache: corpus resident on device "
                f"({audio_cache.nbytes / 1e6:.0f} MB)"
            )
        else:
            logger.info(
                f"audio cache: off (over {cache_mb:.0f} MB budget or "
                f"empty corpus); per-batch int16 reads"
            )

    def mk(idx, sh):
        loader = BatchLoader(
            dataset, idx, bs, pad_to_multiple=pad, shuffle=sh,
            seed=cfg.get("seed", 0),
            audio_cfg=cfg.audio.to_dict(),  # batched-on-device fbank/batch
            bucket_windows=int(cfg.trainer.get("bucket_windows", 8)),
            audio_cache=audio_cache,
        )
        # multi-host: identical global batches everywhere, each process
        # keeps its row slice (HostRowShard docstring has the why)
        if jax.process_count() > 1:
            from multimodalreactiongeneration_tpu.data.dataset import (
                HostRowShard,
            )

            loader = HostRowShard(
                loader, jax.process_index(), jax.process_count()
            )
        return PrefetchLoader(loader, depth) if depth > 0 else loader

    return mk(tr, True), mk(va, False), mk(te, False), dataset


def make_windowed_loaders(cfg, logger):
    from multimodalreactiongeneration_tpu.data.databuild import DataBuilder
    from multimodalreactiongeneration_tpu.data.dataset import (
        WindowBatchLoader,
        WindowDataset,
        random_split_indices,
    )

    builder = DataBuilder(cfg.data, logger)
    dataset = WindowDataset(builder.data_site, cfg.data, cfg.audio)
    assert len(dataset) != 0, "dataset is empty"
    tr, va, te = random_split_indices(
        len(dataset), cfg.exp.train_rate, cfg.exp.valid_rate, seed=cfg.get("seed", 0)
    )
    logger.info(
        f"train size: {len(tr)}, valid size: {len(va)}, test size: {len(te)}"
    )
    bs = cfg.exp.batch_size

    def mk(idx, sh):
        loader = WindowBatchLoader(
            dataset, idx, bs, shuffle=sh, seed=cfg.get("seed", 0)
        )
        if jax.process_count() > 1:
            from multimodalreactiongeneration_tpu.data.dataset import (
                HostRowShard,
            )

            loader = HostRowShard(
                loader, jax.process_index(), jax.process_count()
            )
        return loader

    return mk(tr, True), mk(va, False), mk(te, False), dataset


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument(
        "overrides", nargs="*", help="key=value dotted overrides"
    )
    args = parser.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    logger = set_logger(cfg.exp.use_model, cfg.get("log_dir", "log"))
    model_type = cfg.exp.use_model

    # persistent XLA compile cache: every (B, T) bucket shape is a
    # one-time cost across runs, not per process (utils/compile_cache.py)
    from multimodalreactiongeneration_tpu.utils.compile_cache import (
        DEFAULT_CACHE_DIR,
        enable_compile_cache,
    )

    enable_compile_cache(
        cfg.trainer.get("compile_cache_dir", DEFAULT_CACHE_DIR)
    )

    # multi-host: join the jax.distributed coordinator when launched by a
    # pod orchestrator (no-op single process; parallel/distributed.py)
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    ) > 1:
        from multimodalreactiongeneration_tpu.parallel.distributed import (
            initialize_multihost,
        )

        initialize_multihost(
            os.environ.get("JAX_COORDINATOR_ADDRESS"),
            process_id=int(os.environ["JAX_PROCESS_ID"])
            if "JAX_PROCESS_ID" in os.environ
            else None,
        )
        logger.info(
            f"multi-host: process {jax.process_index()} of "
            f"{jax.process_count()}"
        )

    model = build_model(model_type, cfg.model)
    optimizer = build_optimizer(
        cfg.optim,
        accumulate_grad_batches=cfg.trainer.get("accumulate_grad_batches", 1),
    )

    if model_type == "simple_lstm":
        train_loader, val_loader, _, _ = make_windowed_loaders(cfg, logger)
        train_step, eval_step = windowed_step_fns(
            model, cfg.model.to_dict(), cfg.metrics.to_dict(), optimizer
        )
        init_batch = next(iter(train_loader))[:2]
    else:
        train_loader, val_loader, _, _ = make_streaming_loaders(cfg, logger)
        import jax.numpy as jnp

        compute_dtype = (
            jnp.bfloat16
            if str(cfg.trainer.get("precision", 32)) in ("bf16", "bfloat16")
            else jnp.float32
        )
        train_step, eval_step = streaming_step_fns(
            model,
            cfg.model.to_dict(),
            cfg.metrics.to_dict(),
            optimizer,
            mask_self_motion_input=(model_type == "lstmformer"),
            compute_dtype=compute_dtype,
            remat=cfg.trainer.get("remat", False),
        )
        if cfg.model.get("use_scheduled_sampling", False):
            from multimodalreactiongeneration_tpu.train.harness import (
                scheduled_sampling_step_fn,
            )

            train_step = scheduled_sampling_step_fn(
                model,
                model_type,
                cfg.model.to_dict(),
                cfg.metrics.to_dict(),
                optimizer,
            )
        batch = next(iter(train_loader))
        init_batch = [b[0] for b in batch][:6]

    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.get("seed", 0)), *init_batch
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(f"model: {model_type}, parameters: {n_params:,}")

    init_opt_state = None
    start_epoch = 0
    if cfg.get("resume_from"):
        from multimodalreactiongeneration_tpu.train.checkpoint import (
            load_checkpoint,
            restore_opt_state,
        )

        payload = load_checkpoint(cfg.resume_from)
        params = payload["params"]
        init_opt_state = restore_opt_state(payload, optimizer, params)
        start_epoch = int(payload.get("epoch", -1)) + 1
        logger.info(
            f"resumed from {cfg.resume_from} at epoch {start_epoch} "
            f"(optimizer state: {'yes' if init_opt_state is not None else 'no'})"
        )

    generation_eval = None
    if model_type != "simple_lstm" and cfg.trainer.get(
        "run_generation_eval", False
    ):
        from multimodalreactiongeneration_tpu.train.generation_eval import (
            make_generation_eval,
        )

        generation_eval = make_generation_eval(
            model, model_type, cfg.model.to_dict()
        )

    # trainer.mesh_shape: [data, model] opts into 2D weight sharding
    # (parallel/mesh.param_sharding); default is the 1-D DP mesh
    mesh = None
    mesh_shape = cfg.trainer.get("mesh_shape")
    if mesh_shape:
        from multimodalreactiongeneration_tpu.parallel.mesh import (
            make_mesh_2d,
        )

        mesh = make_mesh_2d(int(mesh_shape[0]), int(mesh_shape[1]))

    trainer = Trainer(
        model,
        train_step,
        eval_step,
        optimizer,
        cfg.optim,
        mesh=mesh,
        callbacks_cfg=cfg.callbacks.to_dict(),
        log_dir=cfg.get("log_dir", "log"),
        ckpt_dir=os.path.join(cfg.get("ckpt_path", "ckpts"), cfg.name),
        generation_eval=generation_eval,
        scheduled_max_epochs=(
            cfg.model.max_epochs
            if cfg.model.get("use_scheduled_sampling", False)
            else None
        ),
        seed=cfg.get("seed", 0),
        # Lightning fractional semantics (reference config.yaml:128):
        # 0.25 validates 4x per train epoch, patience counted in checks
        val_check_interval=float(cfg.trainer.get("val_check_interval", 1.0)),
    )
    params, result = trainer.fit(
        params,
        train_loader,
        val_loader,
        max_epochs=cfg.trainer.max_epochs,
        init_opt_state=init_opt_state,
        start_epoch=start_epoch,
    )
    logger.info(
        f"done: epochs={result.epochs_run} best_val={result.best_val_loss:.6f}"
    )
    return result


if __name__ == "__main__":
    main()
