"""Pallas sorted-segment kernel: oracle parity + devoxelize VJP equivalence.

The kernel exploits that Morton-sorted points have nondecreasing, gapless
containing-voxel ids at every hierarchy level (every live voxel holds >= 1
point).  These tests check (a) the kernel against a bf16-matched numpy
oracle on synthetic gapless id streams, and (b) that the scatter-free
devoxelize backward (``sparse_conv.devox_plan`` path) matches the XLA
autodiff scatter on a real hierarchy built from random scans.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
from fusiontransformer_tpu.ops.pallas.segment_sum import (
    sorted_segment_weighted_sum)


def test_kernel_matches_bf16_oracle():
    rs = np.random.RandomState(0)
    N, C, E, V = 2048, 32, 8, 900
    nvalid = 890
    extra = rs.multinomial(N - 100 - nvalid, np.ones(nvalid) / nvalid)
    ids = np.repeat(np.arange(nvalid), extra + 1)
    ids = np.concatenate([ids, np.full(N - len(ids), V)])
    g = rs.randn(N, C).astype(np.float32)
    w = rs.rand(N, E).astype(np.float32)
    w[ids >= V] = 0.0

    # the kernel multiplies in f32 and rounds the product to bf16
    contrib = np.asarray(
        jnp.asarray(w[:, :, None] * g[:, None, :]).astype(jnp.bfloat16)
    ).astype(np.float32).reshape(N, E * C)
    ref = np.zeros((V, E * C), np.float32)
    for n in range(N):
        if ids[n] < V:
            ref[ids[n]] += contrib[n]

    out = np.asarray(sorted_segment_weighted_sum(
        jnp.asarray(g), jnp.asarray(w), jnp.asarray(ids), V))[:nvalid]
    np.testing.assert_allclose(out, ref[:nvalid], rtol=1e-5, atol=1e-5)


def _random_hier(seed, n_pts=1024, caps=(1024, 512, 384, 256, 128)):
    rs = np.random.RandomState(seed)
    # unique random coords in a 64^3 box (mix of two scans)
    coords = rs.randint(0, 64, size=(4 * n_pts, 3)).astype(np.int32)
    uniq = np.unique(coords, axis=0)
    rs.shuffle(uniq)
    uniq = uniq[:n_pts]
    n_real = int(0.9 * n_pts)
    valid = np.arange(n_pts) < n_real
    batch = (np.arange(n_pts) % 2).astype(np.int32)
    hier = build_hierarchy(jnp.asarray(uniq), jnp.asarray(batch),
                           jnp.asarray(valid), caps)
    return hier


@pytest.mark.slow
def test_devox_vjp_matches_autodiff():
    level = 2
    hier = _random_hier(1)
    V = hier.levels[level].valid.shape[0]
    C = 48
    rs = np.random.RandomState(2)
    vox = jnp.asarray(rs.randn(V, C).astype(np.float32))
    dout = jnp.asarray(rs.randn(hier.pt_valid.shape[0], C).astype(np.float32))
    idx = hier.pt_corner_idx[level]
    w = hier.pt_corner_w[level]
    plan = sc.devox_plan(hier, level)

    f_auto = lambda v: jnp.vdot(sc.devoxelize_trilinear(v, idx, w), dout)
    f_plan = lambda v: jnp.vdot(
        sc.devoxelize_trilinear(v, idx, w, plan=plan), dout)

    out_a, g_auto = jax.value_and_grad(f_auto)(vox)
    out_p, g_plan = jax.value_and_grad(f_plan)(vox)
    assert np.allclose(float(out_a), float(out_p), rtol=1e-5)
    ga, gp = np.asarray(g_auto), np.asarray(g_plan)
    # bf16 products in the kernel vs f32 in autodiff: tolerate bf16 noise.
    scale = np.abs(ga).max()
    np.testing.assert_allclose(gp, ga, atol=2e-2 * scale, rtol=2e-2)


def test_voxelize_mean_plan_matches_xla():
    level = 2
    hier = _random_hier(5)
    V = hier.levels[level].valid.shape[0]
    N = hier.pt_valid.shape[0]
    C = 48
    rs = np.random.RandomState(6)
    pts = jnp.asarray(rs.randn(N, C).astype(np.float32))
    dout = jnp.asarray(rs.randn(V, C).astype(np.float32))
    plan = sc.devox_plan(hier, level)

    f_x = lambda p: jnp.vdot(sc.voxelize_mean(
        p, hier.pt_voxel_idx[level], hier.pt_valid, V), dout)
    f_p = lambda p: jnp.vdot(sc.voxelize_mean(
        p, hier.pt_voxel_idx[level], hier.pt_valid, V, plan=plan), dout)
    out_x, g_x = jax.value_and_grad(f_x)(pts)
    out_p, g_p = jax.value_and_grad(f_p)(pts)
    assert np.allclose(float(out_x), float(out_p), rtol=2e-2)
    gx, gp = np.asarray(g_x), np.asarray(g_p)
    scale = np.abs(gx).max()
    np.testing.assert_allclose(gp, gx, atol=2e-2 * scale, rtol=2e-2)


def test_devox_vjp_level4():
    level = 4
    hier = _random_hier(3)
    V = hier.levels[level].valid.shape[0]
    C = 16
    rs = np.random.RandomState(4)
    vox = jnp.asarray(rs.randn(V, C).astype(np.float32))
    dout = jnp.asarray(rs.randn(hier.pt_valid.shape[0], C).astype(np.float32))
    idx = hier.pt_corner_idx[level]
    w = hier.pt_corner_w[level]
    plan = sc.devox_plan(hier, level)
    g_auto = jax.grad(
        lambda v: jnp.vdot(sc.devoxelize_trilinear(v, idx, w), dout))(vox)
    g_plan = jax.grad(
        lambda v: jnp.vdot(sc.devoxelize_trilinear(v, idx, w, plan=plan),
                           dout))(vox)
    ga, gp = np.asarray(g_auto), np.asarray(g_plan)
    scale = np.abs(ga).max()
    np.testing.assert_allclose(gp, ga, atol=2e-2 * scale, rtol=2e-2)
