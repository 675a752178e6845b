#!/usr/bin/env python
"""Microbench: point<->voxel transfer scatters/gathers, sorted vs unsorted ids.

Decides the "sorted point stream" refactor (ROADMAP item): if segment_sum
with monotone ids (+ indices_are_sorted=True) and Morton-ordered corner
gathers are materially faster, reorder the SPVCNN point stream to level-0
slot order.

Measures, at L2 and L4 shapes (the two voxelize/devoxelize sites):
  1) voxelize segment_sum: orig-order ids vs sorted ids (w/ and w/o the
     indices_are_sorted hint)
  2) devoxelize fwd gather: orig-order corner rows vs sorted-order rows
  3) devoxelize adjoint: XLA autodiff scatter (orig vs sorted) vs the
     "segment-sum + 8 neighbor-column gathers" formulation
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

_KS2_OFFSETS = [(bx, by, bz)
                for bx in (0, 1) for by in (0, 1) for bz in (0, 1)]
# nbr27 column holding offset -e_k (components in {-1, 0}).
NEG_COLS = np.array([(1 - bx) * 9 + (1 - by) * 3 + (1 - bz)
                     for (bx, by, bz) in _KS2_OFFSETS], np.int64)


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


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    hier = real_maps()
    key = jax.random.PRNGKey(0)
    perm = jnp.asarray(hier.vox0_point_idx)      # sorted slot -> orig point
    N = perm.shape[0]

    for lvl, C in ((2, 128), (4, 256)):
        V = hier.levels[lvl].valid.shape[0]
        ids_o = hier.pt_voxel_idx[lvl]           # orig order
        cid_o = hier.pt_corner_idx[lvl]          # [N, 8]
        cw_o = hier.pt_corner_w[lvl]
        # sorted-order variants (permute rows; pad slots -> sentinel V)
        take = lambda a, fill: jnp.where(
            (perm < N)[(...,) + (None,) * (a.ndim - 1)],
            pad_row(a.astype(a.dtype))[jnp.minimum(perm, N)], fill)
        ids_s = jnp.where(perm < N, jnp.concatenate(
            [ids_o, jnp.full((1,), V, ids_o.dtype)])[jnp.minimum(perm, N)], V)
        cid_s = jnp.concatenate(
            [cid_o, jnp.full((1, 8), V, cid_o.dtype)])[jnp.minimum(perm, N)]
        cw_s = jnp.concatenate(
            [cw_o, jnp.zeros((1, 8), cw_o.dtype)])[jnp.minimum(perm, N)]
        mono = bool(np.all(np.diff(np.asarray(ids_s)[np.asarray(ids_s) < V])
                           >= 0))
        print(f"\n== level {lvl}: V={V}, C={C}  sorted ids monotone: {mono}")

        k1, k2, key = jax.random.split(key, 3)
        z = jax.random.normal(k1, (N, C), jnp.bfloat16)
        vox = jax.random.normal(k2, (V, C), jnp.bfloat16)

        # ---- 1) voxelize segment_sum
        def seg(ids, hint):
            @jax.jit
            def f(z):
                return jax.ops.segment_sum(z.astype(jnp.float32), ids,
                                           num_segments=V + 1,
                                           indices_are_sorted=hint)
            return f

        print(f"  voxelize seg_sum orig            {timeit(seg(ids_o, False), z):7.2f} ms")
        print(f"  voxelize seg_sum sorted          {timeit(seg(ids_s, False), z):7.2f} ms")
        print(f"  voxelize seg_sum sorted+hint     {timeit(seg(ids_s, True), z):7.2f} ms")

        # ---- 2) devox fwd gather
        def devox(cid, cw):
            @jax.jit
            def f(vox):
                g = pad_row(vox)[cid.T]
                return jnp.einsum("nk,knc->nc", cw.astype(g.dtype), g,
                                  preferred_element_type=jnp.float32)
            return f

        print(f"  devox fwd orig                   {timeit(devox(cid_o, cw_o), vox):7.2f} ms")
        print(f"  devox fwd sorted                 {timeit(devox(cid_s, cw_s), vox):7.2f} ms")

        # ---- 3) devox adjoint
        def devox_adj_auto(cid, cw):
            def fwd(vox, g):
                gg = pad_row(vox)[cid.T]
                out = jnp.einsum("nk,knc->nc", cw.astype(gg.dtype), gg,
                                 preferred_element_type=jnp.float32)
                return jnp.vdot(out, g.astype(out.dtype))
            @jax.jit
            def f(vox, g):
                return jax.grad(fwd)(vox, g)
            return f

        nbr = hier.levels[lvl].nbr_idx
        neg_cols = jnp.asarray(NEG_COLS)

        def devox_adj_seg(ids, cw, hint):
            @jax.jit
            def f(g):
                # S[u, k*C:(k+1)*C] = sum_{p: vox(p)=u} w[p,k] g[p]
                data = (cw[:, :, None].astype(jnp.float32)
                        * g[:, None, :].astype(jnp.float32)).reshape(N, 8 * C)
                S = jax.ops.segment_sum(data, ids, num_segments=V + 1,
                                        indices_are_sorted=hint)
                S = S[:V].reshape(V, 8, C)
                Sp = jnp.concatenate([S, jnp.zeros((1, 8, C), S.dtype)], 0)
                out = 0.
                for k in range(8):
                    col = nbr[:, int(NEG_COLS[k])]
                    out = out + Sp[col, k]
                return out
            return f

        g = jax.random.normal(key, (N, C), jnp.bfloat16)
        a = np.asarray(devox_adj_auto(cid_o, cw_o)(vox, g))
        b = np.asarray(devox_adj_seg(ids_o, cw_o, False)(g))[:V]
        err = np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-6)
        print(f"  devox adjoint parity (auto vs seg): {err:.2e}")
        print(f"  devox adj autodiff orig          {timeit(devox_adj_auto(cid_o, cw_o), vox, g):7.2f} ms")
        print(f"  devox adj autodiff sorted        {timeit(devox_adj_auto(cid_s, cw_s), vox, g):7.2f} ms")
        print(f"  devox adj seg8 orig              {timeit(devox_adj_seg(ids_o, cw_o, False), g):7.2f} ms")
        print(f"  devox adj seg8 sorted+hint       {timeit(devox_adj_seg(ids_s, cw_s, True), g):7.2f} ms")


if __name__ == "__main__":
    main()
