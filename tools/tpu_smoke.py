#!/usr/bin/env python
"""On-device smoke test: Pallas kernel + sparse conv numerics on the real TPU.

The pytest suite pins numerics on CPU (tests/conftest.py forces the CPU
backend + interpret-mode Pallas), so Mosaic lowering regressions only show
up on hardware.  This script runs the two device-sensitive paths at real
shapes and checks them against oracles; exit code 0 == healthy.

Usage: python tools/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    import jax
    import jax.numpy as jnp

    from fusiontransformer_tpu.ops.pallas.segment_sum import (
        sorted_segment_weighted_sum, sorted_segment_weighted_sum_ref)

    print("backend:", jax.default_backend(), jax.devices())

    # 1) Pallas sorted-segment kernel vs XLA oracle at flagship-like shapes.
    rs = np.random.RandomState(0)
    N, C, E, V = 40960, 256, 8, 4096
    nvalid = 4000
    extra = rs.multinomial(N - 4096 - nvalid, np.ones(nvalid) / nvalid)
    ids = np.repeat(np.arange(nvalid), extra + 1)
    ids = np.concatenate([ids, np.full(N - len(ids), V)]).astype(np.int32)
    g = rs.randn(N, C).astype(np.float32)
    w = rs.rand(N, E).astype(np.float32)
    w[ids >= V] = 0.0
    out = np.asarray(sorted_segment_weighted_sum(
        jnp.asarray(g), jnp.asarray(w), jnp.asarray(ids), V))[:nvalid]
    ref = np.asarray(sorted_segment_weighted_sum_ref(
        jnp.asarray(g), jnp.asarray(w), jnp.asarray(ids), V))[:nvalid]
    err = np.abs(out - ref) / (np.abs(ref) + 1.0)
    assert err.max() < 0.05, f"segment kernel mismatch: {err.max()}"
    print(f"segment kernel OK (max rel err {err.max():.4f})")

    # 2) Sparse conv + hierarchy numerics on device vs a direct check:
    # a +x-only kernel must read the +x neighbor.
    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
    from fusiontransformer_tpu.ops import sparse_conv as sc

    n = 8
    gidx = np.arange(n, dtype=np.int32)
    coords = np.stack(np.meshgrid(gidx, gidx, gidx, indexing="ij"),
                      -1).reshape(-1, 3)
    Np = coords.shape[0]
    caps = (Np, Np, 256, 128, 128)
    hier = jax.jit(lambda c, b, v: build_hierarchy(c, b, v, caps))(
        jnp.asarray(coords), jnp.zeros(Np, jnp.int32), jnp.ones(Np, bool))
    Cc = 8
    feats = jnp.asarray(rs.randn(Np, Cc), jnp.float32)
    k_plus_x = (1 + 1) * 9 + (0 + 1) * 3 + (0 + 1)
    wk = np.zeros((27, Cc, Cc), np.float32)
    wk[k_plus_x] = np.eye(Cc)
    fs = sc.gather_rows(feats, hier.vox0_point_idx)
    outc = np.asarray(sc.subm_conv3(fs, jnp.asarray(wk),
                                    hier.levels[0].nbr_idx,
                                    compute_dtype=jnp.float32))
    cs = np.asarray(hier.levels[0].coords)
    fsn = np.asarray(fs)
    lut = {tuple(c): i for i, c in enumerate(cs)}
    bad = 0
    for i, c in enumerate(cs):
        nb = (c[0] + 1, c[1], c[2])
        expect = fsn[lut[nb]] if nb in lut else np.zeros(Cc)
        if not np.allclose(outc[i], expect, atol=1e-4):
            bad += 1
    assert bad == 0, f"{bad} voxels read the wrong neighbor"  # true f32 now
    print("sparse conv + hierarchy OK")
    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
