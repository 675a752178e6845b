"""Randomized property sweep for the sparse-op layer.

test_sparse_ops.py checks one random scene against dense np.roll oracles,
which (a) wraps at the grid edge — so it must keep coords away from
boundaries — and (b) exercises one geometry.  This sweep hardens the layer
where sorted-key/Morton logic typically breaks:

* coords AT the coordinate-space boundary (0 and 2**fsl-1): a -1 neighbor
  must be missing, not wrapped, and a +1 overflow at the top coordinate
  must never alias the NEXT SCAN's origin through the packed key's batch
  bits (reference semantics: torchsparse hashes (batch, x, y, z) tuples,
  so cross-scan joins are impossible; ``ops/keys.py`` must match);
* degenerate geometries (axis line, plane, single voxel, dense cube,
  capacity-exact scans) across many seeds;
* the center-tap-skip custom VJP vs jax.grad of an inline 27-gather
  reference on scenes dominated by padded rows.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

FSL = 12
LIMIT = 2 ** FSL
OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
           for dz in (-1, 0, 1)]

_JIT_BUILD = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))


def _scene(scans, cap):
    """Pack per-scan coord lists into padded buffers."""
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    pos = 0
    for b, pts in enumerate(scans):
        pts = np.unique(np.asarray(pts, np.int32), axis=0)
        coords[pos:pos + len(pts)] = pts
        batch[pos:pos + len(pts)] = b
        valid[pos:pos + len(pts)] = True
        pos += len(pts)
    return coords, batch, valid


def _conv_oracle(coords, batch, valid, feats, w):
    """Dict-join oracle: out[v] = sum_k f[(batch, coords+off_k)] @ w[k],
    neighbors outside [0, LIMIT) or in another scan missing."""
    table = {(int(b),) + tuple(map(int, c)): i
             for i, (b, c) in enumerate(zip(batch, coords)) if valid[i]}
    out = np.zeros((len(coords), w.shape[2]), np.float32)
    for i in range(len(coords)):
        if not valid[i]:
            continue
        for k, off in enumerate(OFFSETS):
            q = np.asarray(coords[i]) + off
            if (q < 0).any() or (q >= LIMIT).any():
                continue
            j = table.get((int(batch[i]),) + tuple(map(int, q)))
            if j is not None:
                out[i] += feats[j] @ w[k]
    return out


def _lossless_caps(coords, batch, valid, num_levels=3):
    """Exact per-level caps so the hierarchy never drops voxels (overflow
    truncates a level and correctly degrades the descent below it — a
    separate, documented behavior that test_sparse_ops covers)."""
    caps = []
    for l in range(num_levels):
        keys = {(int(b),) + tuple(map(int, np.asarray(c) >> l))
                for b, c, v in zip(batch, coords, valid) if v}
        caps.append(max(128, -(-len(keys) // 128) * 128))
    caps[0] = min(caps[0], len(coords))
    return tuple(caps)


def _check_conv(coords, batch, valid, rng, caps=None):
    feats = rng.randn(len(coords), 4).astype(np.float32)
    feats[~valid] = 0.0
    w = rng.randn(27, 4, 8).astype(np.float32) * 0.1
    caps = caps or _lossless_caps(coords, batch, valid)
    h = jax.tree_util.tree_map(np.asarray, _JIT_BUILD(
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid),
        caps, (0,), FSL))
    l0 = h.levels[0]
    vox_feats = sc.gather_rows(jnp.asarray(feats), h.vox0_point_idx)
    out = np.asarray(sc.subm_conv3(vox_feats, jnp.asarray(w), l0.nbr_idx,
                                   compute_dtype=jnp.float32))
    ref = _conv_oracle(coords, batch, valid, feats, w)
    slots = np.asarray(h.pt_sorted_pos)
    ok = valid & (slots < len(l0.valid))
    np.testing.assert_allclose(out[slots[ok]], ref[ok], rtol=1e-4, atol=1e-4)


def test_boundary_coords_no_wrap_no_batch_alias():
    """Voxels at coordinate 0 and LIMIT-1 in two scans: -1 neighbors must be
    missing (not wrapped to LIMIT-1), and scan 0's top-coordinate +1
    neighbor must never alias scan 1's origin voxel."""
    top = LIMIT - 1
    scan0 = [(0, 0, 0), (0, 0, 1), (1, 0, 0),
             (top, top, top), (top, top, top - 1), (top - 1, top, top)]
    scan1 = [(0, 0, 0), (1, 1, 1), (top, top, top)]
    coords, batch, valid = _scene([scan0, scan1], cap=128)
    rng = np.random.RandomState(0)
    _check_conv(coords, batch, valid, rng)


@pytest.mark.parametrize("seed", range(6))
def test_random_geometry_sweep(seed):
    rng = np.random.RandomState(seed)
    geoms = {
        "uniform": rng.randint(0, LIMIT, size=(100, 3)),
        "plane": np.stack([rng.randint(0, 40, 100),
                           rng.randint(0, 40, 100),
                           np.full(100, rng.randint(0, LIMIT))], 1),
        "line": np.stack([np.arange(64), np.zeros(64, int),
                          np.zeros(64, int)], 1),
        "cube": np.stack(np.meshgrid(*[np.arange(4)] * 3,
                                     indexing="ij"), -1).reshape(-1, 3)
                + rng.randint(0, LIMIT - 4),
        "single": np.array([[rng.randint(0, LIMIT)] * 3]),
    }
    name = list(geoms)[seed % len(geoms)]
    pts = np.clip(geoms[name], 0, LIMIT - 1)
    scan1 = rng.randint(0, LIMIT, size=(40, 3))
    coords, batch, valid = _scene([pts, scan1], cap=256)
    _check_conv(coords, batch, valid, rng)


def test_capacity_exact_scan():
    """A scan that fills level-0 capacity exactly (no padding headroom)."""
    rng = np.random.RandomState(7)
    pts = np.unique(rng.randint(0, 64, size=(400, 3)), axis=0)
    cap = len(pts)
    coords, batch, valid = _scene([pts], cap=cap)
    assert valid.all()
    _check_conv(coords, batch, valid, rng)   # cap0 == point count exactly


def test_center_tap_vjp_vs_reference_grad_with_padding():
    """Gradients of the center-tap-skip custom VJP must match jax.grad of an
    inline full-27-gather reference on a scene that is mostly padded rows
    (the masked center term is where padded-row garbage could leak)."""
    rng = np.random.RandomState(3)
    V, C, O = 96, 4, 8
    nvalid = 20
    nbr = np.full((V, 27), V, np.int32)             # all-sentinel default
    # Random MIRROR-CONSISTENT neighborhood (real tables satisfy
    # nbr(v,k)=j <=> nbr(j,26-k)=v because offsets[26-k] == -offsets[k];
    # the custom VJP's single-gather backward relies on it).  Per tap k the
    # map v->j is a random partial permutation (injective, like a real
    # +offset shift); center tap is self.
    nbr[:nvalid, 13] = np.arange(nvalid)
    for k in range(13):
        perm = rng.permutation(nvalid)
        for v in range(nvalid):
            if rng.rand() < 0.4:
                nbr[v, k] = perm[v]
                nbr[perm[v], 26 - k] = v
    feats = rng.randn(V, C).astype(np.float32)
    feats[nvalid:] = rng.randn(V - nvalid, C) * 5   # garbage at padded rows
    w = rng.randn(27, C, O).astype(np.float32) * 0.1
    dout = rng.randn(V, O).astype(np.float32)

    def ref(feats, w):
        g = sc.pad_row(feats)[jnp.asarray(nbr).T]
        return jnp.einsum("kvc,kco->vo", g, w,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    def ours(feats, w):
        return sc.subm_conv3(feats, w, jnp.asarray(nbr),
                             compute_dtype=jnp.float32)

    out_r = ref(jnp.asarray(feats), jnp.asarray(w))
    out_o = ours(jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        def f(feats, w):
            return jnp.sum(fn(feats, w) * jnp.asarray(dout))
        return jax.grad(f, argnums=(0, 1))

    gf_r, gw_r = loss(ref)(jnp.asarray(feats), jnp.asarray(w))
    gf_o, gw_o = loss(ours)(jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gw_o), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_o), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-5)
