#!/usr/bin/env python
"""Microbench: subm-conv3 gather+GEMM formulations at SPVCNN shapes.

The train-step profile shows the 27-tap neighbor gathers (~223 ms/step,
"custom fusion") plus layout reshapes/copies they force (~174 ms/step,
"data formatting") dominate the step, while actual convolutions are 74 ms.
This bench compares formulations on the real chip, using REAL kernel maps
from a synthetic-scan hierarchy (Morton-local indices — uniform-random
indices measure ~5x slower and mislead):

  A) current: voxel-major gather -> reshape [V, 27*C] -> one fat GEMM
  B) tap-major gather [27, V, C] -> einsum kvc,kco->vo (batched GEMM + sum)
  C) B with the gather done on u32-bitcast rows (bf16 pairs -> u32 lanes)
  D) A with u32-bitcast gather
  E) dot_general on [V, 27, C] contracting (1,2)x(0,1) (no explicit reshape)

Each is timed fwd-only and fwd+bwd (grad wrt feats and w).  Sync is a
1-element device slice readback (full-array np.asarray would time the
host tunnel, not the chip).
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

BATCH = 4
POINTS = 18_000
CAPACITY = 20_480


@jax.jit
def _one(x):
    return jax.tree_util.tree_leaves(x)[0].ravel()[:1]


def sync(x):
    np.asarray(_one(x))


def timeit(fn, *args, iters=30):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def pad_row(feats):
    return jnp.concatenate(
        [feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], axis=0)


# ---- variants (fwd) --------------------------------------------------------

def fwd_A(feats, w, nbr):
    V, cin = feats.shape
    cout = w.shape[-1]
    g = pad_row(feats)[nbr].reshape(V, 27 * cin)
    return jnp.dot(g, w.reshape(27 * cin, cout),
                   preferred_element_type=jnp.float32)


def fwd_B(feats, w, nbr_t):
    g = pad_row(feats)[nbr_t]                        # [27, V, C]
    return jnp.einsum("kvc,kco->vo", g, w,
                      preferred_element_type=jnp.float32)


def _gather_u32(feats, idx):
    V, c = feats.shape
    fu = jax.lax.bitcast_convert_type(
        pad_row(feats).reshape(V + 1, c // 2, 2), jnp.uint32)
    g = fu[idx]
    return jax.lax.bitcast_convert_type(g, jnp.bfloat16).reshape(
        idx.shape + (c,))


def fwd_C(feats, w, nbr_t):
    g = _gather_u32(feats, nbr_t)                    # [27, V, C]
    return jnp.einsum("kvc,kco->vo", g, w,
                      preferred_element_type=jnp.float32)


def fwd_D(feats, w, nbr):
    V, cin = feats.shape
    cout = w.shape[-1]
    g = _gather_u32(feats, nbr).reshape(V, 27 * cin)
    return jnp.dot(g, w.reshape(27 * cin, cout),
                   preferred_element_type=jnp.float32)


def fwd_E(feats, w, nbr):
    g = pad_row(feats)[nbr]                          # [V, 27, C]
    return jax.lax.dot_general(g, w, (((1, 2), (0, 1)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_train(fwd, transpose_idx):
    def loss(feats, w, nbr):
        out = fwd(feats, w, nbr)
        return jnp.sum(out * out.astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def run(feats, w, nbr):
        idx = nbr.T if transpose_idx else nbr
        return grad(feats, w, idx)

    @jax.jit
    def runf(feats, w, nbr):
        idx = nbr.T if transpose_idx else nbr
        return fwd(feats, w, idx)

    return runf, run


def real_maps():
    """Kernel maps from a real synthetic-scan hierarchy (Morton locality)."""
    from fusiontransformer_tpu.data.collate import collate_padded
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN
    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

    ds = SyntheticSCN(split=("train",), num_scans=BATCH, num_points=POINTS)
    batch = collate_padded([ds[i] for i in range(BATCH)], BATCH, CAPACITY,
                           370, 1226)
    caps = [BATCH * CAPACITY]
    for frac in (0.8, 0.7, 0.6, 0.5):
        caps.append(max(128, int(round(caps[-1] * frac / 128.0)) * 128))
    hier = jax.jit(lambda c, b, v: build_hierarchy(c, b, v, tuple(caps)))(
        jnp.asarray(batch["coords"]), jnp.asarray(batch["pt_batch"]),
        jnp.asarray(batch["pt_valid"]))
    return jax.block_until_ready(hier)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    hier = real_maps()
    key = jax.random.PRNGKey(0)
    # (label, level, cin, cout) — the SPVCNN channel plan's heavy hitters.
    shapes = [
        ("L0 stem 32->32", 0, 32, 32),
        ("L0 up4 192->96", 0, 192, 96),
        ("L1 96->96", 1, 96, 96),
        ("L2 128->128", 2, 128, 128),
        ("L3 256->256", 3, 256, 256),
        ("L4 256->256", 4, 256, 256),
    ]
    variants = [
        ("A cur", fwd_A, False),
        ("B tapmajor", fwd_B, True),
        ("C tap+u32", fwd_C, True),
        ("D cur+u32", fwd_D, False),
        ("E dotgen", fwd_E, False),
    ]
    for name, lvl, cin, cout in shapes:
        nbr = hier.levels[lvl].nbr_idx
        V = nbr.shape[0]
        k1, k2, key = jax.random.split(key, 3)
        feats = jax.random.normal(k1, (V, cin), jnp.bfloat16)
        w = jax.random.normal(k2, (27, cin, cout), jnp.bfloat16) * 0.05
        ref = None
        print(f"\n== {name}  V={V} {cin}->{cout}")
        for vn, fwd, tr in variants:
            runf, run = make_train(fwd, tr)
            out = np.asarray(runf(feats, w, nbr), np.float32)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-6))
            tf = timeit(runf, feats, w, nbr)
            tb = timeit(run, feats, w, nbr)
            print(f"  {vn:12s} fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms"
                  f"   relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
