"""Training harness: jitted mesh-sharded train/eval steps + fit loop.

Replaces the reference's PyTorch-Lightning trainers
(/root/reference/mr_gen/model/*/trainer.py) and training_step/
validation_step logic (lstmformer.py:357-424, lstm_with_sample.py:278-337,
simple_lstm.py:239-269):

  * loss masking is bit-matched: pred AND target multiplied by the
    (target != -100) mask, then a FULL-tensor mean — padding positions
    contribute zeros to the numerator but stay in the denominator
    (lstmformer.py:372-380; SURVEY.md §7 hard-part #1)
  * sqrt(delta_loss_scale) on delta channels (lstmformer.py:376-378)
  * leading warmup frames sliced off predictions (y[:, lead_len:],
    lstmformer.py:363-369)
  * per-epoch cosine LR, AdamW/SGD (configure_optimizers parity)
  * checkpoint top-k on val_loss (+ genrt/train monitors), early stopping
    (trainer.py:31-57), metrics to JSONL (wandb-free observability)

TPU design: one jitted step = forward + loss + grad + optax update, batch
sharded over the mesh 'data' axis, params replicated; XLA inserts the
gradient all-reduce (psum) — this is the whole DDP replacement.
"""

from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodalreactiongeneration_tpu.data.dataset import PADDING_VALUE
from multimodalreactiongeneration_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)
from multimodalreactiongeneration_tpu.train import checkpoint as ckpt_lib
from multimodalreactiongeneration_tpu.train.losses import build_loss
from multimodalreactiongeneration_tpu.train.metrics import (
    MetricAccumulator,
    gen_target_dict,
    per_slice_sq_err,
)
from multimodalreactiongeneration_tpu.train.optim import (
    build_optimizer,
    cosine_annealing,
    set_learning_rate,
)

Batch = List[Tuple[np.ndarray, np.ndarray]]


def delta_scaler(feat_dim: int, delta_order: int, scale: float) -> jnp.ndarray:
    start = feat_dim // (delta_order + 1)
    s = jnp.ones((feat_dim,), jnp.float32)
    return s.at[start:].set(jnp.sqrt(scale))


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def streaming_step_fns(
    model,
    model_cfg: Dict[str, Any],
    metrics_cfg: Dict[str, Any],
    optimizer: optax.GradientTransformation,
    mask_self_motion_input: bool,
    compute_dtype=jnp.float32,
    remat: bool = False,
):
    """(train_step, eval_step) for LSTMwithSample / Metaformer.

    Batch layout: the 7-tuple of (data, lengths) pairs from pad_collate.
    compute_dtype=bfloat16 runs forward/backward in bf16 (params kept f32
    in the optimizer, cast per step — TPU mixed precision); losses and
    metrics reduce in f32. remat=True rematerializes the forward in the
    backward pass (jax.checkpoint): trades FLOPs for activation memory
    on long sequences.
    """
    lossfun = build_loss(model_cfg)
    target_dict = gen_target_dict(
        metrics_cfg["use_centroid"],
        metrics_cfg["use_angle"],
        metrics_cfg["delta_order"],
    )
    delta_order = metrics_cfg["delta_order"]
    dls = model_cfg.get("delta_loss_scale", 1.0)

    def forward_loss(params, batch, deterministic, rng):
        data = [b[0] for b in batch]
        a_p, m_p, m_s, la, lmp, lms, target = data
        lead_len = lmp.shape[1]
        if mask_self_motion_input:
            m_s = m_s * (m_s != PADDING_VALUE)
        kwargs = {} if deterministic else {"rngs": {"dropout": rng}}
        if compute_dtype != jnp.float32:
            params = _cast_tree(params, compute_dtype)
            a_p, m_p, m_s, la, lmp, lms = _cast_tree(
                (a_p, m_p, m_s, la, lmp, lms), compute_dtype
            )

        def apply_fn(p, *arrays):
            out, _ = model.apply(
                p, *arrays, deterministic=deterministic, **kwargs
            )
            return out
        if remat:
            apply_fn = jax.checkpoint(apply_fn)
        y = apply_fn(params, a_p, m_p, m_s, la, lmp, lms)
        y = y[:, lead_len:].astype(jnp.float32)
        mask = (target != PADDING_VALUE).astype(y.dtype)
        y = y * mask
        t = target * mask
        scaler = delta_scaler(y.shape[-1], delta_order, dls)
        loss = lossfun(y * scaler, t * scaler)
        return loss, (y * scaler, t * scaler)

    def train_step(params, opt_state, batch, rng):
        (loss, (y, t)), grads = jax.value_and_grad(forward_loss, has_aux=True)(
            params, batch, False, rng
        )
        grads = _cast_tree(grads, jnp.float32)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, per_slice_sq_err(y, t, target_dict)

    def eval_step(params, batch):
        data = [b[0] for b in batch]
        a_p, m_p, m_s, la, lmp, lms, target = data
        lead_len = lmp.shape[1]
        if mask_self_motion_input:
            m_s = m_s * (m_s != PADDING_VALUE)
        y, _ = model.apply(params, a_p, m_p, m_s, la, lmp, lms)
        y = y[:, lead_len:]
        mask = (target != PADDING_VALUE).astype(y.dtype)
        y = y * mask
        t = target * mask
        loss = lossfun(y, t)
        return loss, per_slice_sq_err(y, t, target_dict)

    return train_step, eval_step


def scheduled_sampling_step_fn(
    model,
    model_type: str,
    model_cfg: Dict[str, Any],
    metrics_cfg: Dict[str, Any],
    optimizer: optax.GradientTransformation,
):
    """train_step for use_scheduled_sampling=True (reference
    lstm_with_sample.py:278-301 / lstmformer.py:357-385): training loss is
    computed on the AR rollout where each step feeds back the model's own
    prediction with probability rate = epoch/max_epochs. Gradients flow
    through the whole lax.scan.

    Signature: train_step(params, opt_state, batch, rng, rate).
    """
    from multimodalreactiongeneration_tpu.infer.generate import (
        generate_lws,
        generate_metaformer,
    )

    lossfun = build_loss(model_cfg)
    target_dict = gen_target_dict(
        metrics_cfg["use_centroid"],
        metrics_cfg["use_angle"],
        metrics_cfg["delta_order"],
    )
    delta_order = metrics_cfg["delta_order"]
    dls = model_cfg.get("delta_loss_scale", 1.0)
    if model_type == "lstm_with_sampling":
        gen = generate_lws
    else:
        # f32 KV + per-block layout during TRAINING rollouts: gradients
        # flow through the scan, and the reference trains in f32 with
        # exactly these ops (the bf16 shared-KV inference default would
        # perturb the scheduled-sampling loss surface)
        gen = functools.partial(
            generate_metaformer,
            cache_dtype=jnp.float32,
            kv_layout="per_block",
        )

    def forward_loss(params, batch, rng, rate):
        data = tuple(b[0] for b in batch)
        target = data[-1]
        length = data[1].shape[1]
        mask_steps = jax.random.uniform(rng, (length,)) < rate
        y = gen(model, params, data, mask_steps)
        mask = (target != PADDING_VALUE).astype(y.dtype)
        y = y * mask
        t = target * mask
        scaler = delta_scaler(y.shape[-1], delta_order, dls)
        return lossfun(y * scaler, t * scaler), (y * scaler, t * scaler)

    def train_step(params, opt_state, batch, rng, rate):
        (loss, (y, t)), grads = jax.value_and_grad(forward_loss, has_aux=True)(
            params, batch, rng, rate
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, per_slice_sq_err(y, t, target_dict)

    return train_step


def windowed_step_fns(
    model,
    model_cfg: Dict[str, Any],
    metrics_cfg: Dict[str, Any],
    optimizer: optax.GradientTransformation,
):
    """(train_step, eval_step) for SimpleLSTM (fixed-shape windows)."""
    from multimodalreactiongeneration_tpu.models.simple_lstm import (
        simple_lstm_loss,
    )

    target_dict = gen_target_dict(
        metrics_cfg["use_centroid"],
        metrics_cfg["use_angle"],
        metrics_cfg["delta_order"],
    )

    def row_mask(target):
        """Rows _stage appended to fill the data axis are all -100; the
        windowed loss has no element mask (fixed shapes), so zero those
        rows out of pred AND target (full-tensor-mean denominator keeps
        them, same rule as the streaming -100 masking)."""
        real = ~jnp.all(target == PADDING_VALUE, axis=tuple(range(1, target.ndim)))
        return real.reshape((-1,) + (1,) * (target.ndim - 1))

    def forward_loss(params, batch, deterministic, rng):
        fbank, motion, target = batch
        kwargs = {} if deterministic else {"rngs": {"dropout": rng}}
        y = model.apply(
            params, fbank, motion, deterministic=deterministic, **kwargs
        )
        m = row_mask(target)
        loss, y = simple_lstm_loss(
            y, target, motion, model_cfg, metrics_cfg, row_mask=m
        )
        return loss, (y, target * m.astype(target.dtype))

    def train_step(params, opt_state, batch, rng):
        (loss, (y, t)), grads = jax.value_and_grad(forward_loss, has_aux=True)(
            params, batch, False, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, per_slice_sq_err(y, t, target_dict)

    def eval_step(params, batch):
        fbank, motion, target = batch
        y = model.apply(params, fbank, motion)
        from multimodalreactiongeneration_tpu.models.simple_lstm import (
            mse_loss,
            split_and_form,
        )

        if model_cfg.get("all_static", False):
            base = (
                int(metrics_cfg["use_centroid"]) + int(metrics_cfg["use_angle"])
            ) * 3
            y = split_and_form(motion, y, metrics_cfg["delta_order"], base)
        m = row_mask(target).astype(y.dtype)
        y = y * m
        target = target * m
        loss = mse_loss(y, target)
        return loss, per_slice_sq_err(y, target, target_dict)

    return train_step, eval_step


def _batch_frames(batch) -> int:
    """Real (unpadded) motion frames in a host batch, for the per-epoch
    throughput record. Streaming batches are [(x, lengths), ...] pairs
    (lengths host numpy, dataset.py pad_collate), so the tally is free —
    no device sync. Windowed v1 batches are stacked arrays; count B*T of
    the target."""
    last = batch[-1]
    if isinstance(last, (tuple, list)) and len(last) == 2:
        return int(np.asarray(last[1]).sum())
    shape = getattr(last, "shape", ())
    if len(shape) >= 2:
        return int(shape[0] * shape[1])
    return int(shape[0]) if shape else 0


@dataclass
class FitResult:
    epochs_run: int = 0
    best_val_loss: float = float("inf")
    history: List[Dict[str, float]] = field(default_factory=list)
    ckpt_dir: Optional[str] = None


class Trainer:
    """fit() with mesh data-parallel steps, ckpt/early-stop callbacks."""

    def __init__(
        self,
        model,
        train_step,
        eval_step,
        optimizer,
        optim_cfg,
        callbacks_cfg=None,
        log_dir: str = "log",
        ckpt_dir: Optional[str] = None,
        mesh=None,
        generation_eval: Optional[Callable] = None,
        scheduled_max_epochs: Optional[int] = None,
        seed: int = 0,
        val_check_interval: float = 1.0,
    ):
        self.model = model
        self.optimizer = optimizer
        self.optim_cfg = optim_cfg
        self.callbacks = callbacks_cfg or {}
        self.log_dir = log_dir
        self.ckpt_dir = ckpt_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.generation_eval = generation_eval
        self.scheduled_max_epochs = scheduled_max_epochs
        self.seed = seed
        # Lightning semantics (reference config.yaml:128 val_check_interval:
        # 0.25): a float <= 1.0 validates every int(frac * len(train_loader))
        # train steps — 4x/epoch in production — and early-stop patience is
        # counted in validation CHECKS (patience_epoch / val_check_interval,
        # reference lstmformer/trainer.py:58-59). An int > 1 validates every
        # N steps (Lightning's other mode; unused by the reference configs).
        self.val_check_interval = float(val_check_interval)

        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)

        # shardings flow from operand placement: batch split on 'data';
        # params replicated (pure DP) or largest-axis sharded over a
        # 'model' mesh axis when one exists — XLA inserts the gradient
        # all-reduce / weight all-gathers either way.
        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step) if eval_step is not None else None
        self._bsh = bsh
        self._rep = rep
        self._shard_params = (
            "model" in self.mesh.axis_names
            and dict(self.mesh.shape)["model"] > 1
        )

        os.makedirs(log_dir, exist_ok=True)
        self._metrics_path = os.path.join(log_dir, "metrics.jsonl")

    def _place_params(self, tree):
        if self._shard_params:
            from multimodalreactiongeneration_tpu.parallel.mesh import (
                param_sharding,
            )

            return jax.device_put(tree, param_sharding(tree, self.mesh))
        return jax.device_put(tree, self._rep)

    def _stage(self, batch):
        """Host batch -> device, sharded on 'data'. Rows pad to the DATA
        axis size with the -100 sentinel (masked out of the loss
        numerator; the full-tensor-mean denominator grows, same as
        reference padding). Multi-host: each process stages its local
        rows and they assemble into one global batch."""
        n = dict(self.mesh.shape).get("data", self.mesh.devices.size)
        procs = jax.process_count()
        n_local = max(n // procs, 1)

        def put(x):
            if isinstance(x, jax.Array) and procs == 1:
                # already on device (device-collated fbank batches): pad
                # rows in-graph and reshard without a host round trip
                rem = (-x.shape[0]) % n_local
                if rem:
                    fill = jnp.full(
                        (rem,) + x.shape[1:], PADDING_VALUE, x.dtype
                    )
                    x = jnp.concatenate([x, fill], axis=0)
                return jax.device_put(x, self._bsh)
            x = np.asarray(x)
            rem = (-x.shape[0]) % n_local
            if rem:
                fill = np.full((rem,) + x.shape[1:], PADDING_VALUE, x.dtype)
                x = np.concatenate([x, fill], axis=0)
            if procs > 1:
                return jax.make_array_from_process_local_data(self._bsh, x)
            return jax.device_put(x, self._bsh)

        return jax.tree_util.tree_map(put, batch)

    def _log(self, record: Dict[str, Any]):
        # multi-host: one writer — every process computes the same global
        # losses (SPMD), so rank 0's lines are the complete record and
        # concurrent appends from other ranks would interleave/duplicate
        if jax.process_index() != 0:
            return
        with open(self._metrics_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")

    def fit(
        self,
        params,
        train_loader,
        val_loader,
        max_epochs: int,
        init_opt_state=None,
        start_epoch: int = 0,
    ) -> Tuple[Any, FitResult]:
        params = self._place_params(params)
        opt_state = (
            self._place_params(init_opt_state)
            if init_opt_state is not None
            else jax.jit(self.optimizer.init)(params)
        )
        lr_sched = (
            cosine_annealing(self.optim_cfg.lr, self.optim_cfg.max_epochs)
            if self.optim_cfg.use_lr_sched
            else None
        )
        patience_epochs = self.callbacks.get("patience_epoch", max_epochs)
        use_early = self.callbacks.get("use_early_stopping", False)
        top_k = self.callbacks.get("save_top_k", 1)
        # validation cadence (Lightning val_check_interval semantics):
        # fraction of the train epoch, or every-N-steps when > 1. With
        # the production 0.25 this validates 4x/epoch and counts early-
        # stop patience in CHECKS — patience_epoch / val_check_interval
        # (reference lstmformer/trainer.py:58-59) — so patience 10 at
        # 0.25 tolerates 40 non-improving validations, same as Lightning.
        vci = self.val_check_interval
        try:
            n_train_batches = len(train_loader)
        except TypeError:
            n_train_batches = None
        if vci > 1.0:
            val_every = int(vci)
        elif n_train_batches:
            val_every = max(1, int(n_train_batches * vci))
        else:
            val_every = None
        patience = patience_epochs / vci if vci <= 1.0 else patience_epochs
        # multi-host: rank 0 owns checkpoint files — concurrent same-path
        # writes from other ranks would corrupt. train/val monitors are
        # global losses (identical on every rank, SPMD); the genrt
        # monitor is computed on the rank's own val rows, so rank 0's
        # top-k G choice reflects its shard — a ranking heuristic, not a
        # correctness surface
        use_ckpt = (
            self.callbacks.get("use_checkpoint", True)
            and self.ckpt_dir
            and jax.process_index() == 0
        )

        result = FitResult(ckpt_dir=self.ckpt_dir)
        # reference monitors: V{epoch}-{val_loss} for every trainer; the
        # streaming trainers additionally keep top-k on G{epoch}-{genrt}
        # and T{epoch}-{train_loss} (lstmformer/trainer.py:33-57).
        # async_checkpoint=true serializes saves on a background thread
        # so the next epoch's steps overlap the disk write (one save in
        # flight per monitor; flushed before fit returns)
        use_async = self.callbacks.get("async_checkpoint", False)
        savers = {}
        if use_ckpt:
            savers["V"] = ckpt_lib.TopKCheckpointer(
                self.ckpt_dir, top_k=top_k, monitor="V",
                use_async=use_async,
            )
            if self.generation_eval is not None:
                savers["T"] = ckpt_lib.TopKCheckpointer(
                    self.ckpt_dir, top_k=top_k, monitor="T",
                    use_async=use_async,
                )
                savers["G"] = ckpt_lib.TopKCheckpointer(
                    self.ckpt_dir, top_k=top_k, monitor="G",
                    use_async=use_async,
                )
        saver = savers.get("V")
        rng = jax.random.PRNGKey(self.seed)
        wait_checks = 0  # early-stop wait counter, in validation checks
        step = 0
        check_idx = 0
        stop = False

        def _run_check(params, opt_state, epoch, packed_train, rate):
            """One Lightning-style validation check: full val pass (+ AR
            generation rollout when generation_eval is set — reference
            validation_step runs generation every time, lstmformer.py:
            387-424), V/T/G checkpoint monitors, early-stop bookkeeping,
            and a check record in metrics.jsonl. Returns the check's
            scalars so the epoch record can reuse the last one."""
            nonlocal wait_checks, stop, check_idx, val_seconds
            check_idx += 1
            # running train loss for the T monitor: mean over the steps
            # so far this epoch (one scalar readback; the stacked arrays
            # stay on device for the epoch-end metric reduction). Read
            # FIRST: it drains the queued train steps, so the validation
            # timer below charges only validation work to val_seconds
            # and train_frames_per_s stays an honest train-side number
            train_so_far = (
                float(jnp.stack(packed_train)[:, 0].mean())
                if packed_train
                else float("nan")
            )
            t_val = time.time()
            val_metrics = MetricAccumulator("valid_")
            packed_val = []
            val_def = None
            for vbatch in val_loader:
                loss, slices = self._eval_step(params, self._stage(vbatch))
                flat, val_def = jax.tree_util.tree_flatten(slices)
                packed_val.append(jnp.stack([loss] + flat))
            if packed_val:
                arr = np.asarray(jnp.stack(packed_val))
                val_loss = float(arr[:, 0].mean())
                for row in arr:
                    val_metrics.update(val_def.unflatten(list(row[1:])))
            else:
                val_loss = float("nan")
            genrt_loss = None
            if self.generation_eval is not None:
                genrt_loss = float(self.generation_eval(params, val_loader))

            # no validation batches -> the V monitor never fires
            # (Lightning ModelCheckpoint semantics); avoids V{e}-nan files
            # One device snapshot shared by all three monitors: the d2h
            # fetch (the expensive half of a save on remote runtimes) is
            # paid once per check, not once per monitor.
            # callbacks.save_opt_state: "last" (default) keeps optimizer
            # state only in the `last` checkpoint — resume always goes
            # through `last`, and dropping the adam moments from top-k
            # saves cuts each monitor transfer ~2/3 (params 52 MB vs
            # +104 MB opt at production size). "all" restores the
            # Lightning-style full payload in every file.
            snap_opt = (
                opt_state
                if self.callbacks.get("save_opt_state", "last") == "all"
                else None
            )
            snap = (
                ckpt_lib.DeviceSnapshot(params, snap_opt)
                if savers
                else None
            )
            if saver is not None and not np.isnan(val_loss):
                saver.maybe_save(snap, None, epoch, val_loss)
            if "T" in savers and np.isfinite(train_so_far):
                savers["T"].maybe_save(snap, None, epoch, train_so_far)
            if "G" in savers and genrt_loss is not None and np.isfinite(
                genrt_loss
            ):
                savers["G"].maybe_save(snap, None, epoch, genrt_loss)

            if val_loss < result.best_val_loss:
                result.best_val_loss = val_loss
                wait_checks = 0
            elif not np.isnan(val_loss):
                wait_checks += 1
                # >= : Lightning's EarlyStopping stops once wait_count
                # reaches patience (wait_count >= patience)
                if use_early and wait_checks >= patience:
                    stop = True

            check = {
                "epoch": epoch,
                "step": step,
                "val_check": check_idx,
                "val_loss": val_loss,
                "train_loss_so_far": train_so_far,
                **val_metrics.compute(),
            }
            if genrt_loss is not None:
                check["genrt_loss"] = genrt_loss
            if rate is not None:
                # reference logs the teacher-forcing schedule per step
                # (lstmformer.py:359-360); constant within an epoch, so
                # the per-check record is the complete audit trail
                check["scheduled_sampling_rate"] = rate
            self._log(check)
            val_seconds += time.time() - t_val
            return check

        for epoch in range(start_epoch, max_epochs):
            if lr_sched is not None:
                opt_state = set_learning_rate(opt_state, float(lr_sched(epoch)))
            train_metrics = MetricAccumulator("train_")
            t0 = time.time()
            rate = (
                epoch / self.scheduled_max_epochs
                if self.scheduled_max_epochs
                else None
            )
            # loss + metric scalars stay ON DEVICE during the epoch and
            # read back as ONE stacked array at the end: a per-batch
            # np.asarray costs a full host round trip PER LEAF, which
            # measured 4.3 s of a 4.9 s steady epoch on the TPU tunnel
            # (benchmarks/loader_profile.py attribution, 2026-08-19)
            packed_train = []
            train_def = None
            train_frames = 0
            last_check = None
            checks_this_epoch = 0
            val_seconds = 0.0
            # per-epoch batch index for the check cadence: Lightning
            # resets the interval counter every epoch (checks land at the
            # same batch positions each epoch even when the epoch length
            # is not a multiple of the interval)
            for batch_idx, batch in enumerate(train_loader):
                train_frames += _batch_frames(batch)
                rng, sub = jax.random.split(rng)
                staged = self._stage(batch)
                if self.scheduled_max_epochs:
                    params, opt_state, loss, slices = self._train_step(
                        params, opt_state, staged, sub, jnp.float32(rate)
                    )
                else:
                    params, opt_state, loss, slices = self._train_step(
                        params, opt_state, staged, sub
                    )
                flat, train_def = jax.tree_util.tree_flatten(slices)
                packed_train.append(jnp.stack([loss] + flat))
                step += 1
                if val_every and (batch_idx + 1) % val_every == 0:
                    last_check = _run_check(
                        params, opt_state, epoch, packed_train, rate
                    )
                    checks_this_epoch += 1
                    if stop:
                        break
            # the stacked readback is the device sync: train_seconds
            # includes all queued step work (minus the separately-timed
            # validation checks), so frames/s is honest
            if packed_train:
                arr = np.asarray(jnp.stack(packed_train))
                train_loss = float(arr[:, 0].mean())
                for row in arr:
                    train_metrics.update(train_def.unflatten(list(row[1:])))
            else:
                train_loss = float("nan")
            train_seconds = time.time() - t0 - val_seconds
            # epoch-end validation only when no interval check covered
            # this epoch (unsized loader, empty epoch, or interval longer
            # than the epoch) — Lightning likewise skips an extra epoch-
            # end pass when the last interval check already ran
            if last_check is None and not stop:
                last_check = _run_check(
                    params, opt_state, epoch, packed_train, rate
                )
                checks_this_epoch += 1
            val_loss = last_check["val_loss"] if last_check else float("nan")

            record = {
                "epoch": epoch,
                "step": step,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "lr": float(lr_sched(epoch)) if lr_sched else self.optim_cfg.lr,
                "epoch_seconds": time.time() - t0,
                "train_seconds": round(train_seconds, 4),
                "train_frames": train_frames,
                # end-to-end: loader + host collate + staging + steps
                "train_frames_per_s": round(
                    train_frames / max(train_seconds, 1e-9), 1
                ),
                "val_checks": checks_this_epoch,
                "val_seconds": round(val_seconds, 4),
                **train_metrics.compute(),
            }
            if last_check:
                record.update(
                    {
                        k: v
                        for k, v in last_check.items()
                        if k.startswith("valid_")
                    }
                )
                if "genrt_loss" in last_check:
                    record["genrt_loss"] = last_check["genrt_loss"]
            if rate is not None:
                record["scheduled_sampling_rate"] = rate
            self._log(record)
            result.history.append(record)
            result.epochs_run = epoch + 1
            if stop:
                break
        if saver is not None:
            saver.save_last(params, opt_state, result.epochs_run - 1)
        for s in savers.values():
            s.wait()  # flush async saves before anyone reads ckpt_dir
        # multi-host: no collective runs after the last eval step, so
        # non-zero ranks would return (and possibly read ckpt_dir for the
        # best/last checkpoint) while rank 0 is still writing it — hold
        # every rank until rank 0's top-k/last saves are on disk
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("mrgen:fit_ckpts_complete")
        return params, result
