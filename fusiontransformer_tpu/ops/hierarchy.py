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
* level l+1 coords = unique(coords_l >> 1): Morton ``key >> 3`` preserves
  order, so each coarser level is an adjacent-compare cumsum of the previous
  one — the whole coordinate pyramid costs ONE sort (of the input voxels);
* the ks=3 stride=1 kernel map (``nbr_idx``) is searched ONLY at the tiny top
  level (one ``ops.keys.sorted_join``); every finer level's map is then
  *derived top-down with no search at all*: the neighbor of voxel ``c`` at
  offset ``d`` lives in parent brick ``(c >> 1) + e`` at octant slot ``t``,
  where ``e = ((c & 1) + d) >> 1`` and ``t = ((c & 1) + d) & 1`` are static
  per-(octant, tap) tables — so ``nbr_idx(l)`` is one row-gather of the
  parent's 27-entry rows, a one-hot MXU select of the right column, and one
  gather through ``child_idx(l+1)``.  (Measured on v5e: this replaces the
  2.6M-element per-level sort-joins and cuts hierarchy build ~4x; it is also
  the reason the whole build compiles with just TWO lax.sort instances.)
* ks=2 stride=2 down/up maps (``child_idx`` / ``parent_idx`` + ``child_kidx``)
  via the cumsum positions — no search at all;
* trilinear devoxelize corner maps, replacing ``spf.calc_ti_weights`` +
  ``spdevoxelize`` (reference ``models/utils.py:68-106``): a point's corner
  voxels at level l are the ``{0,+1}^3`` columns of its containing voxel's
  level-l neighbor row — one row gather + a static column pick per level.

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
import numpy as np

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
    # Compact conv slots (optional, see build_hierarchy(tap_slots=...)):
    # (src [V, K], tap [V, K]) int32 maps of the first K LIVE taps per voxel
    # (sentinels cap / 27).  LiDAR voxels have <=15 live ks3 neighbors
    # (measured; surfaces are thin), so K=16 gathers ~1.7x fewer rows than
    # the dense 27-tap map at identical math — the sparse-conv row reduction
    # torchsparse gets from its rulebook, without dynamic shapes (binned-slot
    # path in ops/sparse_conv.py, both passes).
    slot_idx: Optional[tuple] = None


class Hierarchy(NamedTuple):
    levels: Tuple[Level, ...]
    pt_sorted_pos: jnp.ndarray   # [N] int32 position of each input point in level 0
    vox0_point_idx: jnp.ndarray  # [cap0] int32 original point index per
    #   level-0 slot (cap0 = L0_CAPACITY_FRACTION * N, may be < N;
    #   sentinel N for unfilled slots)
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


def _corner_weights(points, lshift: int):
    """Trilinear corner weights at a coarser level.

    Raw trilinear weights from the in-voxel fractional position; the caller
    zeroes absent corners and renormalizes over the present ones, mirroring
    torchsparse ``calc_ti_weights`` (reference ``models/utils.py:81-87``).
    """
    frac = (points & ((1 << lshift) - 1)).astype(jnp.float32) / float(1 << lshift)
    w_list = []
    for (bx, by, bz) in _KS2_OFFSETS:
        wx = frac[:, 0] if bx else (1.0 - frac[:, 0])
        wy = frac[:, 1] if by else (1.0 - frac[:, 1])
        wz = frac[:, 2] if bz else (1.0 - frac[:, 2])
        w_list.append(wx * wy * wz)
    return jnp.stack(w_list, axis=1).astype(jnp.float32)


# --------------------------------------------------------------------------- #
# Top-down kernel-map descent (search-free).
#
# For voxel c with octant bits s = c & 1 and ks3 tap offset d in {-1,0,1}:
#   neighbor coord  q = c + d   lives in parent brick  (c >> 1) + e
#   at octant slot  t,          with   e = (s + d) >> 1,   t = (s + d) & 1
# per dimension — both static functions of (octant, tap).  Per octant the
# eight reachable parent bricks are (c >> 1) + (s - 1 + j), j in {0,1}^3, so
# nbr_idx(l) = one row-gather of the parent's nbr rows, a static column
# select, one row-gather of child_idx rows, and a static (brick, slot)
# select.  The selects are done as one-hot float32 matmuls on the MXU
# (HIGHEST precision => exact for indices < 2**24) because a 27V-element
# hardware gather measures ~10x slower than the equivalent matmul at SPVCNN
# shapes (v5e gather: ~360M rows/s).
#
# The same recursion gives trilinear corner maps: corners of a point at the
# top level are the {0,+1}^3 columns of its containing voxel's nbr row, and
# with r = (c >> l) & 1 the level-l corner b is the child of level-(l+1)
# corner (r & b) at slot (r ^ b).
# --------------------------------------------------------------------------- #

def _nbr_descent_tables():
    """Static per-octant one-hot selects for the nbr descent."""
    # octant -> one-hot [27, 8]: pick the 8 reachable parent-brick columns.
    colsel = np.zeros((8, 27, 8), np.float32)
    # octant -> one-hot [64, 27]: pick (brick j3, slot t3) for each tap.
    sel64 = np.zeros((8, 64, 27), np.float32)
    for o in range(8):
        s = ((o >> 2) & 1, (o >> 1) & 1, o & 1)
        for j in range(8):
            jb = ((j >> 2) & 1, (j >> 1) & 1, j & 1)
            e = [s[i] - 1 + jb[i] for i in range(3)]
            col = (e[0] + 1) * 9 + (e[1] + 1) * 3 + (e[2] + 1)
            colsel[o, col, j] = 1.0
        for k, (dx, dy, dz) in enumerate(_KS3_OFFSETS):
            j3 = t3 = 0
            for i, d in enumerate((dx, dy, dz)):
                e = (s[i] + d) >> 1
                t = (s[i] + d) & 1
                j3 = j3 * 2 + (e - (s[i] - 1))     # position in colsel row
                t3 = t3 * 2 + t
            sel64[o, j3 * 8 + t3, k] = 1.0
    return colsel, sel64


_NBR_COLSEL, _NBR_SEL64 = _nbr_descent_tables()
# Per-level corners: nbr27 columns for per-dim offsets {0, +1}.
_CORNER_TOP_COLS = np.array(
    [(bx + 1) * 9 + (by + 1) * 3 + (bz + 1)
     for (bx, by, bz) in _KS2_OFFSETS], np.int64)


def _onehot_select(rows, sel_mats, which):
    """out[v, j] = sum_k rows[v, k] * sel_mats[which[v], k, j].

    ``sel_mats`` are static one-hot float32 matrices, so this is an exact
    integer select for values < 2**24, done as 8 MXU matmuls + a blend
    instead of a (slow) element gather.
    """
    rf = rows.astype(jnp.float32)
    out = None
    for o in range(sel_mats.shape[0]):
        s = jax.lax.dot(rf, jnp.asarray(sel_mats[o]),
                        precision=jax.lax.Precision.HIGHEST)
        out = s if out is None else jnp.where((which == o)[:, None], s, out)
    return out.astype(jnp.int32)


def _pad_rows(arr, fill):
    """Append one row filled with ``fill`` (sentinel target for gathers)."""
    pad = jnp.full((1,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)


def build_hierarchy(coords, batch_idx, valid,
                    level_caps: Tuple[int, ...],
                    point_levels: Tuple[int, ...] = (0, 2, 4),
                    full_scale_log2: int = 12,
                    tap_slots: Tuple[int, ...] = ()) -> Hierarchy:
    """Build the full voxel hierarchy + all kernel maps for one batch.

    Args:
      coords: [N, 3] int32 voxel coords in [0, 2**full_scale_log2), unique per
        scan (the dataloader guarantees this, matching the reference pipeline).
      batch_idx: [N] int32 scan index.
      valid: [N] bool mask for padding.
      level_caps: static per-level voxel capacities; level 0 cap may be below
        N (the padded point buffer) since invalid points sort to the tail.
      point_levels: levels for which point<->voxel transfer maps are built.
    """
    N = coords.shape[0]
    num_levels = len(level_caps)
    cap0 = level_caps[0]
    assert cap0 <= N, "level-0 capacity cannot exceed the point capacity"

    levels = []
    parent_links = []  # (parent_idx, child_kidx) for level l -> l+1

    # ----- level 0: sort the input voxels --------------------------------
    # Invalid points carry INVALID_KEY and sort to the tail, so a level-0
    # capacity below N (the point buffer is padded ~25-30% above typical
    # occupancy) is just a slice of the sorted arrays; every conv at L0 then
    # gathers over cap0 rows instead of N (gathers are row-rate-bound).
    hi, lo = K.pack_keys(batch_idx, coords, valid)
    hi_s, lo_s, perm = K.sort_by_key(hi, lo, jnp.arange(N, dtype=jnp.int32))
    nvalid_raw0 = jnp.sum((hi_s != K.INVALID_KEY).astype(jnp.int32))
    hi_s, lo_s, perm = hi_s[:cap0], lo_s[:cap0], perm[:cap0]
    b_s, c_s = K.unpack_keys(hi_s, lo_s)
    valid_s = hi_s != K.INVALID_KEY
    nvalid = jnp.sum(valid_s.astype(jnp.int32))
    lvl0 = Level(
        key_hi=hi_s, key_lo=lo_s,
        coords=jnp.where(valid_s[:, None], c_s, 0),
        batch=jnp.where(valid_s, b_s, 0),
        valid=valid_s, nvalid=nvalid, nvalid_raw=nvalid_raw0,
        nbr_idx=None, child_idx=None, parent_idx=None, child_kidx=None,
    )
    levels.append(lvl0)

    pt_sorted_pos = (
        jnp.full((N,), cap0, jnp.int32)
        .at[perm].set(jnp.arange(cap0, dtype=jnp.int32), mode="drop")
    )
    pt_sorted_pos = jnp.where(valid, pt_sorted_pos, cap0)
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

    # ----- kernel maps: ONE small join at the top + search-free descent ---
    # Only the coarsest (smallest) level is searched with a sort-join; every
    # finer level's ks3 map and every corner map is derived by the static
    # parent-brick recursion (see module docstring).  The whole build
    # therefore contains exactly TWO lax.sort instances (input sort + top
    # join), which bounds both runtime and XLA compile time.
    T = num_levels - 1
    top = levels[T]
    nq_hi, nq_lo = _nbr_queries(top, 1 << (full_scale_log2 - T))
    nbr26 = K.sorted_join(top.key_hi, top.key_lo, nq_hi, nq_lo)
    nbr_by_level = [None] * num_levels
    nbr_by_level[T] = _nbr_from_26(top, nbr26)

    for l in range(T - 1, -1, -1):
        cap = level_caps[l]
        cap_next = level_caps[l + 1]
        p_idx, c_kidx = parent_links[l]
        pnbr = _pad_rows(nbr_by_level[l + 1], cap_next)[p_idx]    # [V, 27]
        brick8 = _onehot_select(pnbr, _NBR_COLSEL, c_kidx)        # [V, 8]
        child2d = _pad_rows(levels[l + 1].child_idx, cap)
        childs = child2d[brick8]                                  # [V, 8, 8]
        nbr_by_level[l] = _onehot_select(
            childs.reshape(-1, 64), _NBR_SEL64, c_kidx)

    # ----- compact conv slots (optional) ------------------------------------
    # Per level: (src, tap) of the first K LIVE taps per voxel, compacted
    # live-first in tap order by a cumsum + one-hot select (no lax.sort —
    # ~40 s XLA compile per sort instance).  ks=3 convs then gather K source
    # rows per voxel instead of 27 (ops/sparse_conv.py binned-slot path);
    # live taps beyond K are dropped and counted by steps.tap_overflow
    # (sized so that's 0, like capacities).  Sentinels: src=cap (zero pad
    # row), tap=27 (all-zero one-hot).
    slot_by_level = [None] * num_levels
    if tap_slots:
        assert len(tap_slots) == num_levels, (tap_slots, num_levels)
        for l, k_slots in enumerate(tap_slots):
            if not k_slots:
                continue
            cap = level_caps[l]
            nbr = nbr_by_level[l]                               # [V, 27]
            live = nbr < cap
            tap = jax.lax.broadcasted_iota(jnp.int32, nbr.shape, 1)
            pos = jnp.cumsum(live.astype(jnp.int32), axis=1) - 1
            pos = jnp.where(live, pos, 27)                      # dead -> no slot
            sel = (pos[..., None] ==
                   jnp.arange(k_slots, dtype=jnp.int32)).astype(jnp.int32)
            hit = jnp.sum(sel, axis=1)                          # [V, K] 0/1
            src = (jnp.sum(nbr[..., None] * sel, axis=1) * hit
                   + (1 - hit) * cap)
            tapk = jnp.sum(tap[..., None] * sel, axis=1) + (1 - hit) * 27
            slot_by_level[l] = (src, tapk)

    out_levels = []
    for l in range(num_levels):
        if l < num_levels - 1:
            p_idx, c_kidx = parent_links[l]
        else:
            p_idx, c_kidx = None, None
        out_levels.append(levels[l]._replace(
            nbr_idx=nbr_by_level[l], parent_idx=p_idx, child_kidx=c_kidx,
            slot_idx=slot_by_level[l]))

    # ----- point->voxel containment + trilinear corner maps ----------------
    pt_corner_idx = [None] * num_levels
    pt_corner_w = [None] * num_levels
    pt_voxel_idx = [None] * num_levels
    if 0 in point_levels:
        # Stride-1: points coincide with voxels, so trilinear devoxelize
        # degenerates to an identity gather (weight-1 corner 0).
        pt_voxel_idx[0] = pt_sorted_pos

    need_pt = sorted(l for l in point_levels if l > 0)
    if need_pt:
        # A point's corner voxels at level l are the {0,+1}^3 columns of its
        # CONTAINING voxel's ks3 neighbor row — and nbr_idx already exists at
        # every level, so each corner map is one [N]-row gather + a static
        # column pick (the recursive corner descent this replaces burned
        # ~13 ms/step in lane-padded [N*8, 8] int shapes).
        anc_by_level = {0: pt_sorted_pos}
        for l in range(0, T):
            p_idx, _ = parent_links[l]
            anc_by_level[l + 1] = jnp.concatenate(
                [p_idx, jnp.full((1,), level_caps[l + 1], jnp.int32)])[
                    anc_by_level[l]]
        cols = jnp.asarray(_CORNER_TOP_COLS, jnp.int32)
        for l in need_pt:
            cap = level_caps[l]
            # Slice the 8 corner columns BEFORE the [N]-row gather: [*, 27]
            # s32 rows pad to 128 lanes, so gathering the full nbr row moved
            # 4.7x dead lanes per row (profiled ~0.6 ms/step at bench
            # shapes); the [V, 8] pre-slice is a one-time small copy.
            nbr8 = nbr_by_level[l][:, cols]
            idx8 = _pad_rows(nbr8, cap)[anc_by_level[l]]           # [N, 8]
            idx8 = jnp.where(valid[:, None], idx8, cap)
            w8 = _corner_weights(coords, l)
            w8 = jnp.where(idx8 == cap, 0.0, w8)
            # torchsparse ``calc_ti_weights`` renormalizes over the PRESENT
            # corners (``w /= w.sum(0) + 1e-8``) — interpolation over the
            # partial corner neighborhood, which is most surface voxels at
            # coarse strides.  Verified end-to-end by tools/check_parity.py
            # (without this, full-model logits diverge by ~9e-2).
            w8 = w8 / (jnp.sum(w8, axis=1, keepdims=True) + 1e-8)
            pt_corner_idx[l] = idx8
            pt_corner_w[l] = w8
            pt_voxel_idx[l] = jnp.where(valid, idx8[:, 0], cap)

    return Hierarchy(
        levels=tuple(out_levels),
        pt_sorted_pos=pt_sorted_pos,
        vox0_point_idx=vox0_point_idx,
        pt_valid=valid,
        pt_corner_idx=tuple(pt_corner_idx),
        pt_corner_w=tuple(pt_corner_w),
        pt_voxel_idx=tuple(pt_voxel_idx),
    )


def attach_grouped_slots(hier: Hierarchy, batch) -> Hierarchy:
    """Attach host-built group-pooled slot maps (``ops.host_slots``) from a
    batch dict (``gslot_src_{l}``/``gslot_bin_{l}`` arrays) to the levels.
    The conv layer routes on the maps' [V/8, S] shape
    (``sparse_conv.subm_conv3``); levels without maps keep their existing
    ``slot_idx`` (usually None — the builder is called with
    ``tap_slots=()`` when host maps are in play)."""
    levels = list(hier.levels)
    for l in range(len(levels)):
        if f"gslot_src_{l}" in batch:
            levels[l] = levels[l]._replace(slot_idx=(
                batch[f"gslot_src_{l}"], batch[f"gslot_bin_{l}"]))
    return hier._replace(levels=tuple(levels))
