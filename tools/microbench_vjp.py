#!/usr/bin/env python
"""Microbench: current subm-conv3 custom VJP vs tap-major + gd-reuse VJP.

New formulation:
  fwd:  g  = pad(feats)[nbr_t]            [27, V, Cin]   (tap-major gather)
        out = einsum('kvc,kco->vo', g, w)                (batched GEMM + sum)
  bwd:  gd = pad(dout)[nbr_t][::-1]       [27, V, Cout]  (ONE gather)
        dfeats = einsum('kvo,kco->vc', gd, w)
        dW     = einsum('vc,kvo->kco', feats, gd)        (NO feats re-gather:
          mirror symmetry nbr(v,d)=u <=> nbr(u,26-d)=v makes the scattered
          dout at u equal dout[nbr(u,26-d)], which gd already holds)

Verifies grad parity between old and new custom VJPs, then times them.
"""

from __future__ import annotations

import functools
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

from fusiontransformer_tpu.ops import sparse_conv as sc

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
    return (time.perf_counter() - t0) / iters * 1e3


def pad_row(feats):
    return jnp.concatenate(
        [feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], axis=0)


# ---- new tap-major custom VJP ----------------------------------------------

def _new_impl(feats, w, nbr_idx, cdt):
    g = pad_row(feats.astype(cdt))[nbr_idx.T]          # [27, V, Cin]
    return jnp.einsum("kvc,kco->vo", g, w.astype(cdt),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def subm3_new(feats, w, nbr_idx, cdt):
    return _new_impl(feats, w, nbr_idx, cdt)


def _new_fwd(feats, w, nbr_idx, cdt):
    return _new_impl(feats, w, nbr_idx, cdt), (feats, w, nbr_idx)


def _new_bwd(cdt, res, dout):
    feats, w, nbr_idx = res
    gd = pad_row(dout.astype(cdt))[nbr_idx.T][::-1]    # [27, V, Cout] mirrored
    dfeats = jnp.einsum("kvo,kco->vc", gd, w.astype(cdt),
                        preferred_element_type=jnp.float32).astype(feats.dtype)
    dw = jnp.einsum("vc,kvo->kco", feats.astype(cdt), gd,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return dfeats, dw, np.zeros(nbr_idx.shape, jax.dtypes.float0)


subm3_new.defvjp(_new_fwd, _new_bwd)


def real_maps():
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


def make(fn):
    def loss(feats, w, nbr):
        out = fn(feats, w, nbr, jnp.bfloat16)
        return jnp.sum(out * out)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    runf = jax.jit(lambda f, w, n: fn(f, w, n, jnp.bfloat16))
    return runf, grad


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    hier = real_maps()
    key = jax.random.PRNGKey(0)
    shapes = [
        ("L0 stem 32->32", 0, 32, 32),
        ("L0 up4 192->96", 0, 192, 96),
        ("L1 96->96", 1, 96, 96),
        ("L2 128->128", 2, 128, 128),
        ("L3 256->256", 3, 256, 256),
        ("L4 256->256", 4, 256, 256),
    ]
    for name, lvl, cin, cout in shapes:
        nbr = hier.levels[lvl].nbr_idx
        V = nbr.shape[0]
        k1, k2, key = jax.random.split(key, 3)
        feats = jax.random.normal(k1, (V, cin), jnp.bfloat16)
        w = jax.random.normal(k2, (27, cin, cout), jnp.bfloat16) * 0.05
        print(f"\n== {name}  V={V} {cin}->{cout}")
        out_o, out_n = None, None
        results = {}
        for vn, fn in (("old", sc._subm3), ("new", subm3_new)):
            runf, grad = make(fn)
            out = np.asarray(runf(feats, w, nbr), np.float32)
            g = grad(feats, w, nbr)
            results[vn] = (out, np.asarray(g[0], np.float32),
                           np.asarray(g[1], np.float32))
            tf = timeit(runf, feats, w, nbr)
            tb = timeit(grad, feats, w, nbr)
            print(f"  {vn}  fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms",
                  flush=True)
        for i, what in enumerate(("out", "dfeats", "dw")):
            a, b = results["old"][i], results["new"][i]
            err = np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-6)
            print(f"  parity {what}: {err:.2e}")


if __name__ == "__main__":
    main()
