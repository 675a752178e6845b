"""Optional Weights & Biases shim.

The reference logs to wandb throughout (``SemanticTrainer.py:27-38,204-209``).
wandb is not available in this environment, so this module exposes the same
call surface as a no-op unless the real package is importable.
"""

from __future__ import annotations

try:  # pragma: no cover
    import wandb as _wandb

    HAS_WANDB = True
except Exception:
    _wandb = None
    HAS_WANDB = False


class _NoOpRun:
    def __getattr__(self, name):
        return lambda *a, **k: None


def login(*a, **k):
    if HAS_WANDB:
        return _wandb.login(*a, **k)


def init(*a, **k):
    if HAS_WANDB:
        return _wandb.init(*a, **k)
    return _NoOpRun()


def watch(*a, **k):
    if HAS_WANDB:
        return _wandb.watch(*a, **k)


def log(*a, **k):
    if HAS_WANDB:
        return _wandb.log(*a, **k)


def save(*a, **k):
    if HAS_WANDB:
        return _wandb.save(*a, **k)


def finish(*a, **k):
    if HAS_WANDB:
        return _wandb.finish(*a, **k)
