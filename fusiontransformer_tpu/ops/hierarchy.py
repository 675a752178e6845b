"""Static-shape voxel hierarchy + rulebook construction.

This is the TPU-native replacement for torchsparse's dynamic coordinate
management (hash tables, ``coord_maps``/``kernel_maps`` caching — reference
``models/utils.py`` and torchsparse internals).  The SPVCNN UNet topology is
static (4 stride-2 downsamples, reference ``models/spvcnn.py:104-162``), so we
precompute the ENTIRE coordinate hierarchy and every kernel map once per batch
with jitted integer ops:

* level 0 = the input voxels (the dataloader already deduplicated them with
  ``sparse_quantize``, reference ``semantic_kitti_dataloader.py:231``, so
  points are 1:1 with level-0 voxels and torchsparse's ``initial_voxelize``
  with pres=vres=1, reference ``models/utils.py:15-35``, is an identity here);
* level l+1 coords = unique(coords_l >> 1): one key sort + adjacent-compare
  cumsum (floor-division does NOT preserve lexicographic tuple order, so each
  level re-sorts its parent keys);
* ks=3 stride=1 kernel maps (``nbr_idx``) via a single sort-join per level
  (``ops.keys.sorted_join`` — one lax.sort over [table ++ 26 offset-shifted
  query sets] + cummax propagation; TPU's sorter is ~10x faster here than
  serial binary-search gathers);
* ks=2 stride=2 down/up maps (``child_idx`` / ``parent_idx`` + ``child_kidx``)
  via the cumsum positions — no search at all;
* trilinear devoxelize corner maps (8-way sort-join per requested level),
  replacing ``spf.calc_ti_weights`` + ``spdevoxelize``
  (reference ``models/utils.py:68-106``).

Everything is fixed-capacity: each level has a static ``cap``; overflow voxels
are dropped (masked) and counted in ``nvalid_raw`` so callers can detect
undersized capacities.

Kernel offset conventions (documented for weight-porting parity):
* ks=3: k = (dx+1)*9 + (dy+1)*3 + (dz+1), offsets in {-1,0,1} (level units);
* ks=2: k = bx*4 + by*2 + bz, where (bx,by,bz) = child coord & 1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fusiontransformer_tpu.ops import keys as K


class Level(NamedTuple):
    """One resolution level of the sparse voxel hierarchy.

    All index arrays use ``cap`` of the *target* level as the sentinel for
    "missing" (so gathers can read a zero pad row at index ``cap``).
    """

    key_hi: jnp.ndarray          # [V] int32 sorted unique keys (level units)
    key_lo: jnp.ndarray          # [V] int32
    coords: jnp.ndarray          # [V, 3] int32 coords in level units
    batch: jnp.ndarray           # [V] int32 scan index
    valid: jnp.ndarray           # [V] bool
    nvalid: jnp.ndarray          # [] int32 number of live voxels (<= cap)
    nvalid_raw: jnp.ndarray      # [] int32 unique count before capacity clamp
    nbr_idx: jnp.ndarray         # [V, 27] int32 ks3 stride1 kernel map
    child_idx: Optional[jnp.ndarray]   # [V, 8] int32 into level l-1 (None at l=0)
    parent_idx: Optional[jnp.ndarray]  # [V] int32 into level l+1 (None at last)
    child_kidx: Optional[jnp.ndarray]  # [V] int32 in [0, 8) (None at last)


class Hierarchy(NamedTuple):
    levels: Tuple[Level, ...]
    pt_sorted_pos: jnp.ndarray   # [N] int32 position of each input point in level 0
    vox0_point_idx: jnp.ndarray  # [N] int32 original point index per level-0 slot
    pt_valid: jnp.ndarray        # [N] bool
    # Per level: trilinear corner gather map for voxel_to_point, or None.
    pt_corner_idx: Tuple[Optional[jnp.ndarray], ...]  # each [N, 8] int32
    pt_corner_w: Tuple[Optional[jnp.ndarray], ...]    # each [N, 8] float32
    # Per level: containing-voxel index per point (for point_to_voxel pooling).
    pt_voxel_idx: Tuple[Optional[jnp.ndarray], ...]   # each [N] int32


_KS3_OFFSETS = [(dx, dy, dz)
                for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
_KS2_OFFSETS = [(bx, by, bz)
                for bx in (0, 1) for by in (0, 1) for bz in (0, 1)]


def _nbr_queries(level: "Level", coord_limit: int):
    """Query keys for the 26 non-center ks=3 offsets: ([V, 26], [V, 26])."""
    coords = level.coords
    q_hi_list, q_lo_list = [], []
    for (dx, dy, dz) in _KS3_OFFSETS:
        if (dx, dy, dz) == (0, 0, 0):
            continue  # identity tap — patched in by the caller, not searched
        qc = coords + jnp.array([dx, dy, dz], jnp.int32)
        in_bounds = jnp.all((qc >= 0) & (qc < coord_limit), axis=-1)
        q_valid = level.valid & in_bounds
        hi, lo = K.pack_keys(level.batch, qc, q_valid)
        q_hi_list.append(hi)
        q_lo_list.append(lo)
    return jnp.stack(q_hi_list, axis=1), jnp.stack(q_lo_list, axis=1)


def _nbr_from_26(level: "Level", nbr26):
    V = level.key_hi.shape[0]
    center = 13  # (0,0,0) offset index
    self_idx = jnp.where(level.valid,
                         jnp.arange(V, dtype=jnp.int32),
                         jnp.int32(V))[:, None]
    return jnp.concatenate(
        [nbr26[:, :center], self_idx, nbr26[:, center:]], axis=1)


def _corner_queries(points, batch_idx, pt_valid, lshift: int):
    """Trilinear corner query keys + weights at a coarser level.

    Mirrors torchsparse ``calc_ti_weights`` semantics (reference
    ``models/utils.py:81-87``): weights of absent corners are zeroed and NOT
    renormalized (zeroing happens in the caller once indices are known).
    """
    base = points >> lshift                        # [N, 3] level units
    frac = (points & ((1 << lshift) - 1)).astype(jnp.float32) / float(1 << lshift)
    q_hi_list, q_lo_list, w_list = [], [], []
    for (bx, by, bz) in _KS2_OFFSETS:
        qc = base + jnp.array([bx, by, bz], jnp.int32)
        hi, lo = K.pack_keys(batch_idx, qc, pt_valid)
        q_hi_list.append(hi)
        q_lo_list.append(lo)
        wx = frac[:, 0] if bx else (1.0 - frac[:, 0])
        wy = frac[:, 1] if by else (1.0 - frac[:, 1])
        wz = frac[:, 2] if bz else (1.0 - frac[:, 2])
        w_list.append(wx * wy * wz)
    return (jnp.stack(q_hi_list, axis=1), jnp.stack(q_lo_list, axis=1),
            jnp.stack(w_list, axis=1).astype(jnp.float32))


def build_hierarchy(coords, batch_idx, valid,
                    level_caps: Tuple[int, ...],
                    point_levels: Tuple[int, ...] = (0, 2, 4),
                    full_scale_log2: int = 12) -> Hierarchy:
    """Build the full voxel hierarchy + all kernel maps for one batch.

    Args:
      coords: [N, 3] int32 voxel coords in [0, 2**full_scale_log2), unique per
        scan (the dataloader guarantees this, matching the reference pipeline).
      batch_idx: [N] int32 scan index.
      valid: [N] bool mask for padding.
      level_caps: static per-level voxel capacities; level 0 cap must equal N.
      point_levels: levels for which point<->voxel transfer maps are built.
    """
    N = coords.shape[0]
    num_levels = len(level_caps)
    assert level_caps[0] == N, "level-0 capacity must equal the point capacity"

    levels = []
    parent_links = []  # (parent_idx, child_kidx) for level l -> l+1

    # ----- level 0: sort the input voxels --------------------------------
    hi, lo = K.pack_keys(batch_idx, coords, valid)
    hi_s, lo_s, perm = K.sort_by_key(hi, lo, jnp.arange(N, dtype=jnp.int32))
    b_s, c_s = K.unpack_keys(hi_s, lo_s)
    valid_s = hi_s != K.INVALID_KEY
    nvalid = jnp.sum(valid_s.astype(jnp.int32))
    lvl0 = Level(
        key_hi=hi_s, key_lo=lo_s,
        coords=jnp.where(valid_s[:, None], c_s, 0),
        batch=jnp.where(valid_s, b_s, 0),
        valid=valid_s, nvalid=nvalid, nvalid_raw=nvalid,
        nbr_idx=None, child_idx=None, parent_idx=None, child_kidx=None,
    )
    levels.append(lvl0)

    pt_sorted_pos = (
        jnp.full((N,), N, jnp.int32)
        .at[perm].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )
    pt_sorted_pos = jnp.where(valid, pt_sorted_pos, N)
    vox0_point_idx = jnp.where(valid_s, perm, N).astype(jnp.int32)

    # ----- levels 1..L: Morton shift + cumsum-unique (NO re-sort) ----------
    # morton >> 3 preserves lexicographic order, so the parent key sequence
    # of an already-sorted level is itself sorted: adjacent-compare + cumsum
    # yields the coarser level directly.
    for l in range(1, num_levels):
        prev = levels[l - 1]
        cap = level_caps[l]
        cap_prev = level_caps[l - 1]
        phi, plo = K.parent_keys(prev.key_hi, prev.key_lo, prev.valid)
        is_first, position, nuniq = K.unique_sorted(phi, plo)

        in_cap = position < cap
        parent_idx = jnp.where(prev.valid & in_cap, position,
                               cap).astype(jnp.int32)
        # Low 3 Morton bits = the child's octant = the ks2 offset index.
        child_kidx = (prev.key_lo & 7).astype(jnp.int32)
        parent_links.append((parent_idx, child_kidx))

        scatter_pos = jnp.where(is_first & in_cap, position, cap)
        key_hi = (jnp.full((cap,), K.INVALID_KEY, jnp.int32)
                  .at[scatter_pos].set(phi, mode="drop"))
        key_lo = (jnp.full((cap,), K.INVALID_KEY, jnp.int32)
                  .at[scatter_pos].set(plo, mode="drop"))
        b_l, c_l = K.unpack_keys(key_hi, key_lo)
        valid_l = key_hi != K.INVALID_KEY
        child_idx = (jnp.full((cap, 8), cap_prev, jnp.int32)
                     .at[parent_idx, child_kidx]
                     .set(jnp.arange(cap_prev, dtype=jnp.int32), mode="drop"))

        levels.append(Level(
            key_hi=key_hi, key_lo=key_lo,
            coords=jnp.where(valid_l[:, None], c_l, 0),
            batch=jnp.where(valid_l, b_l, 0),
            valid=valid_l,
            nvalid=jnp.minimum(nuniq, cap),
            nvalid_raw=nuniq,
            nbr_idx=None, child_idx=child_idx,
            parent_idx=None, child_kidx=None,
        ))

    # ----- kernel maps: ONE sort-join per level ---------------------------
    # The 26 ks3 neighbor queries and (where needed) the 8 trilinear corner
    # queries of all points share a single join, so each level costs exactly
    # one lax.sort — 6 sorts total for a 5-level hierarchy (input sort + 5
    # joins), which also keeps XLA compile time bounded (each sort instance
    # compiles separately).
    out_levels = []
    pt_corner_idx = [None] * num_levels
    pt_corner_w = [None] * num_levels
    pt_voxel_idx = [None] * num_levels
    if 0 in point_levels:
        # Stride-1: points coincide with voxels, so trilinear devoxelize
        # degenerates to an identity gather (weight-1 corner 0).
        pt_voxel_idx[0] = pt_sorted_pos

    for l in range(num_levels):
        lvl = levels[l]
        if l < num_levels - 1:
            p_idx, c_kidx = parent_links[l]
        else:
            p_idx, c_kidx = None, None

        cap = level_caps[l]
        nq_hi, nq_lo = _nbr_queries(lvl, 1 << (full_scale_log2 - l))
        if l in point_levels and l != 0:
            cq_hi, cq_lo, w8 = _corner_queries(coords, batch_idx, valid, l)
            q_hi = jnp.concatenate([nq_hi.reshape(-1), cq_hi.reshape(-1)])
            q_lo = jnp.concatenate([nq_lo.reshape(-1), cq_lo.reshape(-1)])
            res = K.sorted_join(lvl.key_hi, lvl.key_lo, q_hi, q_lo)
            nbr26 = res[:cap * 26].reshape(cap, 26)
            idx8 = res[cap * 26:].reshape(-1, 8)
            w8 = jnp.where(idx8 == cap, 0.0, w8)
            pt_corner_idx[l] = idx8
            pt_corner_w[l] = w8
            pt_voxel_idx[l] = jnp.where(valid, idx8[:, 0], cap)
        else:
            nbr26 = K.sorted_join(lvl.key_hi, lvl.key_lo, nq_hi, nq_lo)

        nbr = _nbr_from_26(lvl, nbr26)
        out_levels.append(lvl._replace(nbr_idx=nbr, parent_idx=p_idx,
                                       child_kidx=c_kidx))

    return Hierarchy(
        levels=tuple(out_levels),
        pt_sorted_pos=pt_sorted_pos,
        vox0_point_idx=vox0_point_idx,
        pt_valid=valid,
        pt_corner_idx=tuple(pt_corner_idx),
        pt_corner_w=tuple(pt_corner_w),
        pt_voxel_idx=tuple(pt_voxel_idx),
    )
