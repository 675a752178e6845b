"""Randomness control (reference ``common/utils/torch_util.py:6-22``).

On TPU+JAX most of the reference's machinery is unnecessary: jitted programs
are deterministic given explicit PRNG keys, so there is no cudnn.benchmark /
deterministic dance.  What remains host-side is the numpy RNG driving data
augmentation, plus explicit jax keys.
"""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int):
    """Seed host-side RNGs (python, numpy).  -1 keeps time-based seeding."""
    if seed < 0:
        return
    random.seed(seed)
    np.random.seed(seed)


def worker_init_fn(worker_id: int, base_seed: int = 0):
    """Per-worker seed offset (reference torch_util.py:17-22 analog)."""
    set_random_seed(base_seed + worker_id)


def dist_worker_init_fn(worker_id: int, rank: int = 0, num_workers: int = 1,
                        max_epoch: int = 1, base_seed: int = 0):
    """Per-rank seed offset used by the distributed path
    (reference TorchpackInterface.py:59-62 formula)."""
    set_random_seed(base_seed + rank * num_workers * max_epoch + worker_id)


def debug_nans(enable: bool = True):
    """Opt-in NaN checking (SURVEY.md §5 'race detection/sanitizers' plan)."""
    import jax

    jax.config.update("jax_debug_nans", enable)
