"""Morton key invariants at the FULL 12-bit coordinate range.

The original (pre-Morton) parent construction passed small-grid oracles but
silently over-merged voxels beyond the 10-bit boundary; these tests pin the
properties the hierarchy depends on, at full scale.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.ops import keys as K
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy


def test_pack_unpack_roundtrip_full_range(rng):
    coords = rng.randint(0, 4096, (4096, 3)).astype(np.int32)
    batch = rng.randint(0, 64, 4096).astype(np.int32)
    valid = np.ones(4096, bool)
    hi, lo = K.pack_keys(jnp.asarray(batch), jnp.asarray(coords),
                         jnp.asarray(valid))
    b2, c2 = K.unpack_keys(hi, lo)
    np.testing.assert_array_equal(np.asarray(b2), batch)
    np.testing.assert_array_equal(np.asarray(c2), coords)


def test_parent_keys_consistent_and_order_preserving(rng):
    coords = rng.randint(0, 4096, (4096, 3)).astype(np.int32)
    batch = rng.randint(0, 8, 4096).astype(np.int32)
    valid = np.ones(4096, bool)
    hi, lo = K.pack_keys(jnp.asarray(batch), jnp.asarray(coords),
                         jnp.asarray(valid))
    phi, plo = K.parent_keys(hi, lo, jnp.asarray(valid))
    phi2, plo2 = K.pack_keys(jnp.asarray(batch), jnp.asarray(coords >> 1),
                             jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(phi), np.asarray(phi2))
    np.testing.assert_array_equal(np.asarray(plo), np.asarray(plo2))

    key = (np.asarray(hi).astype(np.int64) << 31) + np.asarray(lo)
    pkey = (np.asarray(phi).astype(np.int64) << 31) + np.asarray(plo)
    order = np.argsort(key, kind="stable")
    assert np.all(np.diff(pkey[order]) >= 0)


def test_hierarchy_unique_counts_full_range(rng):
    """Every level's voxel count must match numpy's unique over (b, c >> l)."""
    n = 3000
    cap = 3072
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    pts = np.unique(rng.randint(0, 4096, (n, 3)).astype(np.int32), axis=0)
    k = min(len(pts), cap)
    coords[:k] = pts[:k]
    batch[:k] = rng.randint(0, 3, k)
    valid[:k] = True
    # Re-unique per (batch, coords).
    arr = np.concatenate([batch[:k, None], coords[:k]], 1)
    _, first = np.unique(arr, axis=0, return_index=True)
    mask = np.zeros(k, bool)
    mask[first] = True
    valid[:k] = mask

    caps = (cap, cap, cap, cap, cap)
    h = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, caps)
    sel = valid
    for l in range(5):
        expected = len(np.unique(np.concatenate(
            [batch[sel][:, None], coords[sel] >> l], 1), axis=0))
        got = int(np.asarray(h.levels[l].nvalid_raw))
        assert got == expected, (l, got, expected)
