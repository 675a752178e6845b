#!/usr/bin/env python
"""Microbench + on-TPU parity for the Pallas sorted-segment kernel.

Shapes mirror the devoxelize-adjoint call sites (E=8 trilinear corners):
L0 (C=32 and 96) and L4 (C=256) at the bench batch sizes.  Prints kernel vs
XLA-scatter oracle time and max relative error.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fusiontransformer_tpu.ops.pallas.segment_sum import (
    _sorted_segment_weighted_sum, sorted_segment_weighted_sum_ref)


def timeit(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def make_stream(rng, n, num_out, pts_per_vox):
    """Nondecreasing, gapless ids over [0, nvalid); tail = sentinel num_out."""
    nvalid_rows = max(8, int(n * 0.85 / pts_per_vox))
    nvalid_rows = min(nvalid_rows, num_out - 1)
    counts = rng.multinomial(int(n * 0.85) - nvalid_rows,
                             np.ones(nvalid_rows) / nvalid_rows) + 1
    ids = np.repeat(np.arange(nvalid_rows, dtype=np.int32), counts)
    pad = n - ids.shape[0]
    ids = np.concatenate([ids, np.full(pad, num_out, np.int32)])
    w = rng.standard_normal((n, 8)).astype(np.float32)
    w[ids >= num_out] = 0.0
    g = rng.standard_normal((n, 128)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(w), jnp.asarray(g)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    batch = int(os.environ.get("BENCH_BATCH", 2))
    n = batch * 20480

    # Only the real call-site shapes: spvcnn passes plans at L2 (C=128) and
    # L4 (C=256).  (Smaller C hits a Mosaic reshape limitation — minor dim
    # below lane width — and is not used by the model.)
    for name, num_out, c, ppv in (
            ("L2/C128", batch * 7808, 128, 2.6),
            ("L4/C256", batch * 1792, 256, 11.6)):
        ids, w, g128 = make_stream(rng, n, num_out, ppv)
        g = g128[:, :c].astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)

        def kern(g, w, ids):
            return _sorted_segment_weighted_sum(g, w, ids, num_out,
                                                interpret=False)

        def oracle(g, w, ids):
            return sorted_segment_weighted_sum_ref(g, w, ids, num_out)

        kern = jax.jit(kern)
        oracle = jax.jit(oracle)
        tk, ok = timeit(kern, g, w, ids)
        to, oo = timeit(oracle, g, w, ids)
        a, b = np.asarray(ok), np.asarray(oo)
        err = np.max(np.abs(a - b)) / (np.abs(b).max() + 1e-6)
        print(f"{name:9s} N={n} V={num_out}  kernel {tk:6.2f} ms  "
              f"xla-scatter {to:6.2f} ms  ({to / tk:4.1f}x)  relerr {err:.2e}")


if __name__ == "__main__":
    main()
