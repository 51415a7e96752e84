"""Optimizer / LR schedule factory (reference configure_optimizers,
simple_lstm.py:193-221 — AdamW or SGD+momentum, optional per-epoch
CosineAnnealingLR with T_max=optim.max_epochs, eta_min=0)."""

from __future__ import annotations

from typing import Callable

import optax


def cosine_annealing(base_lr: float, t_max: int) -> Callable[[int], float]:
    """torch CosineAnnealingLR(eta_min=0), stepped per EPOCH."""
    sched = optax.cosine_decay_schedule(base_lr, decay_steps=t_max, alpha=0.0)
    return lambda epoch: sched(min(epoch, t_max))


def build_optimizer(
    optim_cfg, accumulate_grad_batches: int = 1
) -> optax.GradientTransformation:
    """optim group of the reference YAML -> optax chain.

    The learning rate is injected via optax.inject_hyperparams so the
    per-epoch cosine schedule can be driven from the fit loop exactly like
    Lightning steps torch's scheduler once per epoch.

    accumulate_grad_batches > 1 wraps the optimizer in optax.MultiSteps —
    the TPU equivalent of Lightning's trainer.accumulate_grad_batches
    (reference config.yaml trainer group; reference configs use 1).
    """
    kind = optim_cfg.use_optimizer
    if kind == "adam":
        make = lambda learning_rate: optax.adamw(
            learning_rate, weight_decay=optim_cfg.weight_decay
        )
    elif kind == "sgd":
        # torch SGD(weight_decay) is L2 added to the gradient, momentum after
        make = lambda learning_rate: optax.chain(
            optax.add_decayed_weights(optim_cfg.weight_decay),
            optax.sgd(learning_rate, momentum=optim_cfg.momentum),
        )
    else:
        raise ValueError(f"invalid optimizer type {kind!r}")
    opt = optax.inject_hyperparams(make)(learning_rate=optim_cfg.lr)
    if accumulate_grad_batches > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate_grad_batches)
    return opt


def set_learning_rate(opt_state, lr: float):
    """Update the injected hyperparam in-place-functionally (transparent
    to optax.MultiSteps wrapping)."""
    if hasattr(opt_state, "inner_opt_state"):  # MultiSteps
        inner = opt_state.inner_opt_state
        return opt_state._replace(
            inner_opt_state=inner._replace(
                hyperparams={**inner.hyperparams, "learning_rate": lr}
            )
        )
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": lr}
    )
