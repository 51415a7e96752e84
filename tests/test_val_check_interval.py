"""Lightning val_check_interval semantics in the Trainer.

Reference production configs set `val_check_interval: 0.25`
(/root/reference/mr_gen/model/lstmformer/config.yaml:128): validation
runs every int(0.25 * len(train_loader)) train batches — 4x/epoch — and
early-stop patience is counted in validation CHECKS
(patience_epoch / val_check_interval, lstmformer/trainer.py:58-59).
These tests drive the Trainer with synthetic step functions so the
cadence, patience arithmetic, and scheduled_sampling_rate logging are
asserted exactly, without model/compile noise.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.train.harness import Trainer
from multimodalreactiongeneration_tpu.utils.config import from_dict

OPTIM = from_dict(
    dict(
        use_optimizer="sgd",
        momentum=0.0,
        weight_decay=0.0,
        lr=1e-3,
        use_lr_sched=False,
        batch_size=2,
        max_epochs=4,
    )
)


class FakeLoader:
    """Yields (x, lengths) singleton batches; val batches carry their
    desired per-check loss in x so the jitted eval step stays pure."""

    def __init__(self, values, frames=4):
        self.values = list(values)
        self.frames = frames

    def __len__(self):
        return len(self.values)

    def __iter__(self):
        # rows fill the mesh data axis exactly: short batches would be
        # padded with the -100 sentinel, polluting the fake mean-loss
        rows = jax.device_count()
        for v in self.values:
            x = np.full((rows, self.frames), v, np.float32)
            lengths = np.full((rows,), self.frames, np.int64)
            yield [(x, lengths)]


class ScheduledValLoader(FakeLoader):
    """Pops one loss value per validation pass (per check)."""

    def __init__(self, schedule):
        super().__init__([0.0])
        self.schedule = list(schedule)

    def __len__(self):
        return 1

    def __iter__(self):
        v = self.schedule.pop(0) if self.schedule else 1.0
        rows = jax.device_count()
        x = np.full((rows, 4), v, np.float32)
        yield [(x, np.full((rows,), 4, np.int64))]


def fake_steps(with_rate=False):
    slices = {"m": (jnp.float32(0.0), jnp.float32(1.0))}  # (sum, count)

    def train_step(params, opt_state, batch, rng, *rate):
        del rng, rate
        x = batch[0][0]
        loss = jnp.mean(x) + params["w"][0]
        return params, opt_state, loss, slices

    def eval_step(params, batch):
        x = batch[0][0]
        return jnp.mean(x).astype(jnp.float32), slices

    return train_step, eval_step


class IdentityOpt:
    """optax-shaped no-op optimizer (jit-compatible)."""

    def init(self, params):
        return jnp.zeros(())

    def update(self, grads, state, params=None):
        del params
        return jax.tree_util.tree_map(jnp.zeros_like, grads), state


def make_trainer(tmp_path, vci, callbacks=None, scheduled_max_epochs=None):
    train_step, eval_step = fake_steps()
    return Trainer(
        model=None,
        train_step=train_step,
        eval_step=eval_step,
        optimizer=IdentityOpt(),
        optim_cfg=OPTIM,
        callbacks_cfg=callbacks
        or dict(use_checkpoint=False, use_early_stopping=False),
        log_dir=str(tmp_path / "log"),
        ckpt_dir=None,
        scheduled_max_epochs=scheduled_max_epochs,
        val_check_interval=vci,
    )


def _params():
    return {"w": jnp.zeros((1,), jnp.float32)}


def _check_lines(tmp_path):
    lines = (tmp_path / "log" / "metrics.jsonl").read_text().splitlines()
    recs = [json.loads(l) for l in lines]
    return [r for r in recs if "val_check" in r], [
        r for r in recs if "val_check" not in r
    ]


def test_quarter_interval_validates_4x_per_epoch(tmp_path):
    trainer = make_trainer(tmp_path, vci=0.25)
    train_loader = FakeLoader([0.0] * 8)
    val_loader = FakeLoader([0.5])
    _, result = trainer.fit(_params(), train_loader, val_loader, max_epochs=2)
    assert [h["val_checks"] for h in result.history] == [4, 4]
    checks, epochs = _check_lines(tmp_path)
    assert len(checks) == 8 and len(epochs) == 2
    # checks land every 2 batches (int(8 * 0.25)), counter resets per epoch
    assert [c["step"] for c in checks] == [2, 4, 6, 8, 10, 12, 14, 16]
    # the epoch record's val_loss is the last check's value
    assert epochs[0]["val_loss"] == checks[3]["val_loss"] == 0.5


def test_default_interval_is_one_check_at_epoch_end(tmp_path):
    trainer = make_trainer(tmp_path, vci=1.0)
    train_loader = FakeLoader([0.0] * 5)
    val_loader = FakeLoader([0.25])
    _, result = trainer.fit(_params(), train_loader, val_loader, max_epochs=2)
    assert [h["val_checks"] for h in result.history] == [1, 1]
    checks, _ = _check_lines(tmp_path)
    assert [c["step"] for c in checks] == [5, 10]


def test_patience_counted_in_validation_checks(tmp_path):
    # vci=0.5 over 4 train batches -> 2 checks/epoch; patience_epoch=1
    # -> patience = 1 / 0.5 = 2 CHECKS (reference trainer.py:58-59).
    # Val losses: 1.0 (new best), then flat -> wait hits 2 at the FIRST
    # check of epoch 1: training stops mid-epoch after 2 of 4 batches.
    trainer = make_trainer(
        tmp_path,
        vci=0.5,
        callbacks=dict(
            use_checkpoint=False, use_early_stopping=True, patience_epoch=1
        ),
    )
    train_loader = FakeLoader([0.0] * 4)
    val_loader = ScheduledValLoader([1.0, 1.0, 1.0, 1.0])
    _, result = trainer.fit(_params(), train_loader, val_loader, max_epochs=9)
    assert result.epochs_run == 2  # stopped inside epoch index 1
    steps = [h["step"] for h in result.history]
    assert steps == [4, 6]  # epoch 1 ran only 2 of its 4 batches
    checks, _ = _check_lines(tmp_path)
    assert len(checks) == 3  # check 3 tripped the stop


def test_per_epoch_patience_unchanged_at_default_interval(tmp_path):
    # same flat-loss setup at vci=1.0: patience 1 check == 1 epoch, so
    # the stop fires after the second epoch's (single) check
    trainer = make_trainer(
        tmp_path,
        vci=1.0,
        callbacks=dict(
            use_checkpoint=False, use_early_stopping=True, patience_epoch=1
        ),
    )
    train_loader = FakeLoader([0.0] * 4)
    val_loader = ScheduledValLoader([1.0, 1.0, 1.0])
    _, result = trainer.fit(_params(), train_loader, val_loader, max_epochs=9)
    assert result.epochs_run == 2
    steps = [h["step"] for h in result.history]
    assert steps == [4, 8]  # both epochs ran fully


def test_scheduled_sampling_rate_logged(tmp_path):
    trainer = make_trainer(tmp_path, vci=0.5, scheduled_max_epochs=4)
    train_loader = FakeLoader([0.0] * 4)
    val_loader = FakeLoader([0.5])
    _, result = trainer.fit(_params(), train_loader, val_loader, max_epochs=2)
    checks, epochs = _check_lines(tmp_path)
    # reference lstmformer.py:359-360 logs rate = epoch / max_epochs
    assert [c["scheduled_sampling_rate"] for c in checks] == [
        0.0, 0.0, 0.25, 0.25
    ]
    assert [e["scheduled_sampling_rate"] for e in epochs] == [0.0, 0.25]
