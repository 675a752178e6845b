"""Scatter-free custom VJPs must match XLA autodiff exactly (f32, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

CAPS = (256, 256, 192, 128, 64)


def _scene(rng, cap=256):
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    pts = np.unique(rng.randint(0, 40, (300, 3)).astype(np.int32), axis=0)[:200]
    k = len(pts)
    coords[:k] = pts
    valid[:k] = True
    return coords, batch, valid, k


def test_subm3_vjp_matches_autodiff(rng):
    coords, batch, valid, k = _scene(rng)
    h = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS)
    nbr = h.levels[0].nbr_idx
    V = CAPS[0]
    feats = jnp.asarray(rng.randn(V, 8).astype(np.float32))
    feats = feats * jnp.asarray(valid)[:, None]
    w = jnp.asarray(rng.randn(27, 8, 16).astype(np.float32) * 0.2)
    cot = jnp.asarray(rng.randn(V, 16).astype(np.float32))

    def loss_custom(f, w):
        return jnp.vdot(sc.subm_conv3(f, w, nbr, jnp.float32), cot)

    def loss_ref(f, w):
        return jnp.vdot(sc._subm3_impl(f, w, nbr, jnp.float32), cot)

    g1 = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-4)


def test_down_up_vjp_matches_autodiff(rng):
    coords, batch, valid, k = _scene(rng)
    h = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS)
    l0, l1 = h.levels[0], h.levels[1]
    v0, v1 = CAPS[0], CAPS[1]

    xf = jnp.asarray(rng.randn(v0, 6).astype(np.float32)) \
        * jnp.asarray(np.asarray(l0.valid))[:, None]
    wd = jnp.asarray(rng.randn(8, 6, 10).astype(np.float32) * 0.3)
    cot_d = jnp.asarray(rng.randn(v1, 10).astype(np.float32))

    def down_custom(x, w):
        return jnp.vdot(sc.down_conv2(x, w, l1.child_idx, l0.parent_idx,
                                      l0.child_kidx, jnp.float32), cot_d)

    def down_ref(x, w):
        return jnp.vdot(sc._down2_impl(x, w, l1.child_idx, jnp.float32),
                        cot_d)

    g1 = jax.grad(down_custom, argnums=(0, 1))(xf, wd)
    g2 = jax.grad(down_ref, argnums=(0, 1))(xf, wd)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-4)

    xc = jnp.asarray(rng.randn(v1, 10).astype(np.float32)) \
        * jnp.asarray(np.asarray(l1.valid))[:, None]
    wu = jnp.asarray(rng.randn(8, 10, 6).astype(np.float32) * 0.3)
    cot_u = jnp.asarray(rng.randn(v0, 6).astype(np.float32))

    def up_custom(x, w):
        return jnp.vdot(sc.up_conv2(x, w, l0.parent_idx, l0.child_kidx,
                                    l1.child_idx, jnp.float32), cot_u)

    def up_ref(x, w):
        return jnp.vdot(sc._up2_impl(x, w, l0.parent_idx, l0.child_kidx,
                                     jnp.float32), cot_u)

    g1 = jax.grad(up_custom, argnums=(0, 1))(xc, wu)
    g2 = jax.grad(up_ref, argnums=(0, 1))(xc, wu)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-4)
