#!/usr/bin/env python
"""Row-gather microbench at the sparse-conv slot-map shapes.

Measures effective HBM GB/s of `feats[idx]` as a function of channel width
C — testing whether narrow-channel gathers (C=32/64) pay the full 128-lane
tile cost per row (i.e. the gather moves padded tiles, not C elements).

In-program fori_loop slope method (per tools/microbench_binned_conv.py):
wall-clock a jitted loop of n gathers whose output feeds the next
iteration's index derivation so XLA cannot hoist or dedupe.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    V = 17408
    K = 16
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, V, size=(V // 8, 8 * K)), jnp.int32)
    idx_sorted = jnp.sort(idx, axis=1)

    def bench(c, which_idx, dtype=jnp.bfloat16, iters=50):
        feats = jnp.asarray(rng.randn(V, c), dtype)

        @jax.jit
        def loop(f, ix):
            def body(i, acc):
                # acc-dependent index offset (always 0) defeats hoisting;
                # full-tensor sum defeats dead-code elimination of the
                # gather while staying far cheaper than the gather itself.
                g = f[ix + (acc.astype(jnp.int32) & 0)]   # [V/8, 8K, C]
                return acc + g.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        loop(feats, which_idx).block_until_ready()
        t0 = time.perf_counter()
        r = loop(feats, which_idx)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        useful = V * K * c * np.dtype(np.dtype(dtype).name).itemsize
        padded = V * K * max(c, 128) * np.dtype(np.dtype(dtype).name).itemsize
        print(f"C={c:4d} {np.dtype(dtype).name}: {dt*1e3:7.3f} ms  "
              f"useful {useful/dt/1e9:7.1f} GB/s   "
              f"if-tile-padded {padded/dt/1e9:7.1f} GB/s")
        return dt

    print(f"gather [V={V}, C] rows with idx [{V//8}, {8*K}] "
          f"(the L0 slot-map shape)\n")
    for c in (32, 64, 128, 256):
        bench(c, idx)
    print("\nsorted-per-row idx:")
    for c in (32, 128):
        bench(c, idx_sorted)
    print("\nf32:")
    for c in (32, 128):
        bench(c, idx, dtype=jnp.float32)


if __name__ == "__main__":
    main()
