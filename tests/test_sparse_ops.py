"""Numeric parity tests for the sparse-op layer against dense NumPy/XLA oracles.

Strategy (SURVEY.md §4 implications): scatter sparse voxels into a small dense
grid, run a dense convolution, and compare values at the sparse coordinate
sets produced by ops.hierarchy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiontransformer_tpu.ops import keys as K
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
from fusiontransformer_tpu.ops import sparse_conv as sc

GRID = 16  # small dense grid for oracles; coords kept in [1, GRID-1)


def _random_scene(rng, n_scans=2, n_pts=120, cap=256):
    """Random unique voxel coords per scan, padded to cap."""
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    feats = rng.randn(cap, 4).astype(np.float32)
    pos = 0
    for b in range(n_scans):
        pts = rng.randint(1, GRID - 1, size=(n_pts, 3))
        pts = np.unique(pts, axis=0)
        rng.shuffle(pts)
        k = len(pts)
        coords[pos:pos + k] = pts
        batch[pos:pos + k] = b
        valid[pos:pos + k] = True
        pos += k
    feats[~valid] = 0.0
    return coords, batch, valid, feats


_JIT_BUILD = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))

_CACHE = {}


def _build(coords, batch, valid, caps=(256, 256, 192, 128, 64)):
    key = (coords.tobytes(), caps)
    if key not in _CACHE:
        _CACHE[key] = jax.tree_util.tree_map(
            np.asarray, _JIT_BUILD(coords, batch, valid, caps))
    return _CACHE[key]


def test_level0_sort_roundtrip(rng):
    coords, batch, valid, feats = _random_scene(rng)
    h = _build(coords, batch, valid)
    l0 = h.levels[0]
    n = int(l0.nvalid)
    assert n == valid.sum()
    # Sorted keys strictly increasing over valid region (inputs unique per scan).
    hi = np.asarray(l0.key_hi)[:n]
    lo = np.asarray(l0.key_lo)[:n]
    key = hi.astype(np.int64) * (1 << 31) + lo.astype(np.int64)
    assert np.all(np.diff(key) > 0)
    # Round trip point -> slot -> point.
    pos = np.asarray(h.pt_sorted_pos)
    pt_idx = np.asarray(h.vox0_point_idx)
    for i in np.where(valid)[0]:
        assert pt_idx[pos[i]] == i
    # Coordinates at slots match.
    np.testing.assert_array_equal(
        np.asarray(l0.coords)[pos[valid]], coords[valid])


def test_downsample_levels_match_numpy(rng):
    coords, batch, valid, _ = _random_scene(rng)
    h = _build(coords, batch, valid)
    cur = {(b, *c) for b, c in zip(batch[valid], coords[valid] // 1)}
    for l in range(1, 5):
        expected = {(b, x >> 1, y >> 1, z >> 1) for (b, x, y, z) in cur}
        lvl = h.levels[l]
        n = int(lvl.nvalid)
        got = {(int(b), *map(int, c))
               for b, c in zip(np.asarray(lvl.batch)[:n], np.asarray(lvl.coords)[:n])}
        assert got == expected, f"level {l} coords mismatch"
        cur = expected


def test_subm_conv3_vs_dense(rng):
    coords, batch, valid, feats = _random_scene(rng)
    h = _build(coords, batch, valid)
    l0 = h.levels[0]
    cin, cout = 4, 8
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    # Sparse path (float32 compute so the oracle comparison is tight).
    vox_feats = sc.gather_rows(jnp.asarray(feats), h.vox0_point_idx)
    out = sc.subm_conv3(vox_feats, jnp.asarray(w), l0.nbr_idx,
                        compute_dtype=jnp.float32)
    out = np.asarray(out)

    # Dense oracle.
    offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               for dz in (-1, 0, 1)]
    for b in range(2):
        dense = np.zeros((GRID, GRID, GRID, cin), np.float32)
        sel = valid & (batch == b)
        dense[tuple(coords[sel].T)] = feats[sel]
        ref = np.zeros((GRID, GRID, GRID, cout), np.float32)
        for k, (dx, dy, dz) in enumerate(offsets):
            shifted = np.roll(dense, shift=(-dx, -dy, -dz), axis=(0, 1, 2))
            ref += shifted @ w[k]
        slots = np.asarray(h.pt_sorted_pos)[sel]
        np.testing.assert_allclose(
            out[slots], ref[tuple(coords[sel].T)], rtol=1e-4, atol=1e-4)


def test_down_conv2_vs_dense(rng):
    coords, batch, valid, feats = _random_scene(rng)
    h = _build(coords, batch, valid)
    cin, cout = 4, 6
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.1

    vox_feats = sc.gather_rows(jnp.asarray(feats), h.vox0_point_idx)
    out = np.asarray(sc.down_conv2(vox_feats, jnp.asarray(w),
                                   h.levels[1].child_idx,
                                   compute_dtype=jnp.float32))

    l1 = h.levels[1]
    n1 = int(l1.nvalid)
    c1 = np.asarray(l1.coords)[:n1]
    b1 = np.asarray(l1.batch)[:n1]
    koff = [(bx, by, bz) for bx in (0, 1) for by in (0, 1) for bz in (0, 1)]
    for b in range(2):
        dense = np.zeros((GRID, GRID, GRID, cin), np.float32)
        sel = valid & (batch == b)
        dense[tuple(coords[sel].T)] = feats[sel]
        for i in np.where(b1 == b)[0]:
            o = c1[i]
            ref = np.zeros(cout, np.float32)
            for k, (bx, by, bz) in enumerate(koff):
                ref += dense[o[0] * 2 + bx, o[1] * 2 + by, o[2] * 2 + bz] @ w[k]
            np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)


def test_up_conv2_inverts_parent_map(rng):
    coords, batch, valid, feats = _random_scene(rng)
    h = _build(coords, batch, valid)
    l0, l1 = h.levels[0], h.levels[1]
    cin, cout = 3, 5
    n1 = int(l1.nvalid)
    xc = rng.randn(l1.key_hi.shape[0], cin).astype(np.float32)
    xc[n1:] = 0
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.1

    out = np.asarray(sc.up_conv2(jnp.asarray(xc), jnp.asarray(w),
                                 l0.parent_idx, l0.child_kidx,
                                 compute_dtype=jnp.float32))
    n0 = int(l0.nvalid)
    c0 = np.asarray(l0.coords)
    p = np.asarray(l0.parent_idx)
    for v in range(n0):
        k = (c0[v, 0] & 1) * 4 + (c0[v, 1] & 1) * 2 + (c0[v, 2] & 1)
        ref = xc[p[v]] @ w[k]
        np.testing.assert_allclose(out[v], ref, rtol=1e-4, atol=1e-4)


def test_trilinear_devoxelize_weights(rng):
    coords, batch, valid, feats = _random_scene(rng)
    h = _build(coords, batch, valid)
    l2 = h.levels[2]
    c = 4
    v2 = l2.key_hi.shape[0]
    n2 = int(l2.nvalid)
    vf = rng.randn(v2, c).astype(np.float32)
    vf[n2:] = 0

    out = np.asarray(sc.devoxelize_trilinear(
        jnp.asarray(vf), h.pt_corner_idx[2], h.pt_corner_w[2]))

    # NumPy oracle: trilinear over existing corners — absent corners weight 0
    # and the remaining weights renormalized over the PRESENT corners,
    # mirroring torchsparse ``calc_ti_weights`` (``w /= w.sum(0) + 1e-8``;
    # reference ``models/utils.py:81-87``).  Pinned end-to-end by the
    # shared-weights logit parity harness (tools/check_parity.py).
    key2 = {}
    c2 = np.asarray(l2.coords)[:n2]
    b2 = np.asarray(l2.batch)[:n2]
    for i in range(n2):
        key2[(b2[i], *c2[i])] = i
    s = 4.0  # stride at level 2
    for i in np.where(valid)[0][:50]:
        p = coords[i].astype(np.float64)
        base = np.floor(p / s).astype(int)
        f = p / s - base
        ref = np.zeros(c, np.float64)
        wsum = 0.0
        for bx in (0, 1):
            for by in (0, 1):
                for bz in (0, 1):
                    idx = key2.get((batch[i], base[0] + bx, base[1] + by,
                                    base[2] + bz))
                    if idx is None:
                        continue
                    wgt = ((f[0] if bx else 1 - f[0]) *
                           (f[1] if by else 1 - f[1]) *
                           (f[2] if bz else 1 - f[2]))
                    ref += wgt * vf[idx]
                    wsum += wgt
        ref /= wsum + 1e-8
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-5)


def test_voxelize_mean_matches_numpy(rng):
    coords, batch, valid, feats = _random_scene(rng)
    h = _build(coords, batch, valid)
    l2 = h.levels[2]
    v2 = l2.key_hi.shape[0]
    out = np.asarray(sc.voxelize_mean(jnp.asarray(feats), h.pt_voxel_idx[2],
                                      h.pt_valid, v2))
    n2 = int(l2.nvalid)
    c2 = np.asarray(l2.coords)[:n2]
    b2 = np.asarray(l2.batch)[:n2]
    for i in range(0, n2, 7):
        sel = valid & (batch == b2[i]) & np.all(coords // 4 == c2[i], axis=1)
        np.testing.assert_allclose(out[i], feats[sel].mean(0), rtol=1e-4,
                                   atol=1e-5)


def test_capacity_overflow_is_reported(rng):
    coords, batch, valid, feats = _random_scene(rng)
    # Tiny level-1 cap to force overflow.
    h = _JIT_BUILD(coords, batch, valid, (256, 16, 8, 8, 8))
    l1 = h.levels[1]
    assert int(l1.nvalid) == 16
    assert int(l1.nvalid_raw) > 16
    # Overflowed voxels' children must carry the sentinel parent.
    p = np.asarray(h.levels[0].parent_idx)
    assert (p == 16).any()


@pytest.mark.slow
def test_level0_capacity_below_point_buffer(rng):
    """cap0 < N slices the sorted level-0 arrays without changing results
    (invalid points sort to the tail)."""
    coords, batch, valid, feats = _random_scene(rng, n_pts=50)
    cap = coords.shape[0]
    nvalid = int(valid.sum())
    cap0 = ((nvalid + 31) // 32 + 1) * 32      # tight but sufficient
    assert cap0 < cap
    full = _JIT_BUILD(jnp.asarray(coords), jnp.asarray(batch),
                      jnp.asarray(valid), (cap, 128, 128, 128, 128))
    tight = _JIT_BUILD(jnp.asarray(coords), jnp.asarray(batch),
                       jnp.asarray(valid), (cap0, 128, 128, 128, 128))
    assert int(np.asarray(tight.levels[0].nvalid)) == nvalid
    assert int(np.asarray(tight.levels[0].nvalid_raw)) == nvalid
    np.testing.assert_array_equal(
        np.asarray(tight.levels[0].coords)[:nvalid],
        np.asarray(full.levels[0].coords)[:nvalid])
    # a subm conv on both hierarchies agrees on the live rows
    w = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32) * 0.1)
    xf = sc.gather_rows(jnp.asarray(feats), full.vox0_point_idx)
    xt = sc.gather_rows(jnp.asarray(feats), tight.vox0_point_idx)
    of = sc.subm_conv3(xf, w, full.levels[0].nbr_idx,
                       compute_dtype=jnp.float32)
    ot = sc.subm_conv3(xt, w, tight.levels[0].nbr_idx,
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ot)[:nvalid],
                               np.asarray(of)[:nvalid], atol=1e-4)
    # point-side gathers agree in original point order
    zf = sc.gather_rows(of, full.pt_sorted_pos)
    zt = sc.gather_rows(ot, tight.pt_sorted_pos)
    np.testing.assert_allclose(np.asarray(zt)[valid], np.asarray(zf)[valid],
                               atol=1e-4)


def test_subm_conv3_slots_matches_dense(rng):
    """Compact K-slot forward == dense 27-tap conv (values AND grads).

    K covers every voxel's live-tap count here, so the paths must agree
    exactly up to f32 summation order (the slots path sums live taps in
    live-first order).
    """
    import jax
    import jax.numpy as jnp

    from fusiontransformer_tpu.ops import sparse_conv as sc
    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

    cap = 256
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    pts = np.unique(rng.randint(0, 24, size=(300, 3)), axis=0)[:200]
    coords[:len(pts)] = pts
    valid[:len(pts)] = True

    caps = (cap, 192, 128)
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5, 6))(
        coords, batch, valid, caps, (0,), 12, (16, 16, 16))
    lvl = hier.levels[0]
    live = np.asarray((lvl.nbr_idx < cap).sum(axis=1))
    assert live.max() <= 16, live.max()   # K covers this scene

    cin, cout = 24, 40
    feats = jnp.asarray(rng.randn(cap, cin), jnp.float32)
    w = jnp.asarray(rng.randn(27, cin, cout) * 0.1, jnp.float32)

    dense = sc.subm_conv3(feats, w, lvl.nbr_idx, jnp.float32)
    slots = sc.subm_conv3(feats, w, lvl.nbr_idx, jnp.float32,
                          slot_idx=lvl.slot_idx)
    np.testing.assert_allclose(np.asarray(slots), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)

    def loss_dense(f, ww):
        return (sc.subm_conv3(f, ww, lvl.nbr_idx, jnp.float32) ** 2).sum()

    def loss_slots(f, ww):
        return (sc.subm_conv3(f, ww, lvl.nbr_idx, jnp.float32,
                              slot_idx=lvl.slot_idx) ** 2).sum()

    gd = jax.grad(loss_dense, argnums=(0, 1))(feats, w)
    gs = jax.grad(loss_slots, argnums=(0, 1))(feats, w)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_tap_overflow_counts_dropped_live_taps(rng):
    """K below a voxel's live-tap count is counted by steps.tap_overflow."""
    import jax

    from fusiontransformer_tpu.modules.steps import tap_overflow
    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

    cap = 128
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    # A solid 4x4x4 block: interior voxels have the full 27 live taps.
    pts = np.array([(x, y, z) for x in range(4) for y in range(4)
                    for z in range(4)], np.int32)
    coords[:len(pts)] = pts
    valid[:len(pts)] = True
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5, 6))(
        coords, batch, valid, (cap, 128), (0,), 12, (8, 0))
    n_over = int(np.asarray(tap_overflow(hier, (8, 0))))
    live = np.asarray((hier.levels[0].nbr_idx < cap).sum(axis=1))
    assert n_over == int(np.maximum(live - 8, 0).sum()) > 0
