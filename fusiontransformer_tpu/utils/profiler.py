"""Profiling utilities.

The reference ships a cProfile decorator (``common/utils/profiler.py:3-20``);
on TPU the equivalent observability is (a) that same host-side decorator and
(b) ``jax.profiler`` trace contexts + a block-until-ready timing harness for
device work (SURVEY.md §5).
"""

from __future__ import annotations

import cProfile
import contextlib
import io
import pstats
import time
from functools import wraps

import numpy as np


def profile(fnc):
    """cProfile decorator printing cumulative stats (reference parity)."""

    @wraps(fnc)
    def inner(*args, **kwargs):
        pr = cProfile.Profile()
        pr.enable()
        retval = fnc(*args, **kwargs)
        pr.disable()
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats()
        print(s.getvalue())
        return retval

    return inner


@contextlib.contextmanager
def device_trace(log_dir):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield


def time_jitted(fn, *args, iters=10, warmup=1, sync=None):
    """Per-call wall time of a jitted function.

    ``sync`` forces completion; default reads one element back (this
    environment's block_until_ready is unreliable over the device tunnel).
    """
    if sync is None:
        def sync(out):
            leaf = __import__("jax").tree_util.tree_leaves(out)[0]
            np.asarray(leaf).ravel()[:1]

    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50)), times
