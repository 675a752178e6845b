"""Optimizer + LR schedule factory (reference ``common/solver/build.py`` and
``common/solver/lr_scheduler.py``).

optax chains reproducing torch semantics:
* Adam: weight decay added to the gradient BEFORE the moment updates
  (torch's coupled L2, not AdamW);
* SGD: momentum buffer via optax.trace (dampening=0 as in the schema);
* schedulers are per-epoch multiplicative factors (StepLR / MultiStepLR /
  WarmupMultiStepLR) evaluated from the global step via steps_per_epoch,
  with ClipLR flooring the learning rate (``lr_scheduler.py:53-77``).
"""

from __future__ import annotations

import warnings
from bisect import bisect_right

import jax.numpy as jnp
import optax


def make_lr_schedule(cfg, steps_per_epoch: int):
    base_lr = cfg.OPTIMIZER.BASE_LR
    name = cfg.SCHEDULER.TYPE
    clip = cfg.SCHEDULER.CLIP_LR

    def factor(epoch: int) -> float:
        if name == "StepLR":
            p = cfg.SCHEDULER.StepLR
            if p.step_size <= 0:
                return 1.0
            return p.gamma ** (epoch // p.step_size)
        if name == "MultiStepLR":
            p = cfg.SCHEDULER.MultiStepLR
            return p.gamma ** bisect_right(sorted(p.milestones), epoch)
        if name == "WarmupMultiStepLR":
            p = cfg.SCHEDULER.WarmupMultiStepLR
            warm = 1.0
            if epoch < p.warmup_steps:
                alpha = epoch / p.warmup_steps
                warm = p.warmup_factor * (1 - alpha) + alpha
            return warm * p.gamma ** bisect_right(sorted(p.milestones), epoch)
        return 1.0

    def schedule(step):
        # Host-side python schedule; the trainer re-evaluates per epoch, so
        # step -> epoch conversion happens on concrete ints.
        epoch = int(step) // max(1, steps_per_epoch)
        lr = base_lr * factor(epoch)
        if clip > 0:
            lr = max(lr, clip)
        return lr

    return schedule


def build_optimizer(cfg, steps_per_epoch: int = 1):
    """Returns (optax transformation, schedule fn). LR is injected as a
    hyperparameter so the per-epoch scheduler can update it without recompiling.
    """
    name = cfg.OPTIMIZER.TYPE
    if name == "":
        warnings.warn("No optimizer is built.")
        return None, None
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    wd = cfg.OPTIMIZER.WEIGHT_DECAY

    if name == "Adam":
        betas = tuple(cfg.OPTIMIZER.Adam.betas)
        parts = []
        if wd > 0:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=1e-8))
    elif name == "SGD":
        p = cfg.OPTIMIZER.SGD
        parts = []
        if wd > 0:
            parts.append(optax.add_decayed_weights(wd))
        if p.momentum > 0:
            parts.append(optax.trace(decay=p.momentum, nesterov=False))
    else:
        raise ValueError(f"Unsupported type of optimizer: {name}")

    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(*parts,
                                          optax.scale_by_learning_rate(
                                              learning_rate)))(
        learning_rate=schedule(0))

    accum = int(cfg.TRAIN.GRAD_ACCUM_STEPS)
    if accum > 1:
        # Gradient accumulation: average grads over k micro-batches, apply
        # one inner update every k-th call.  Params are bit-identical for
        # the k-1 intermediate calls, so the train step program is unchanged
        # and the accumulator rides in opt_state (checkpointed like any
        # other moment).  Beyond reference parity (SURVEY §2.3: none).
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt, schedule


def _hyperparams_dict(opt_state):
    """The injected-hyperparams dict, descending through wrapper states
    (optax.MultiSteps nests the real state in ``inner_opt_state``)."""
    while not hasattr(opt_state, "hyperparams"):
        opt_state = opt_state.inner_opt_state
    return opt_state.hyperparams


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR in-place (per-epoch scheduler step).

    The new value must keep the exact abstract type of the leaf the train
    step was traced with (concrete f32 array, not a weak-typed python
    float) — a weak-typed leaf changes the jit cache key and forces a full
    retrace of the train step at every epoch boundary (~90 s each)."""
    hp = _hyperparams_dict(opt_state)
    prev = hp["learning_rate"]
    dtype = getattr(prev, "dtype", jnp.float32)
    hp["learning_rate"] = jnp.asarray(lr, dtype=dtype)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(_hyperparams_dict(opt_state)["learning_rate"])
