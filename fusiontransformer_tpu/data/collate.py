"""Padded static-shape batch collation.

The reference concatenates variable-length scans and appends a batch column
(``data/collate.py:37-86``); on TPU every array must have a static shape, so
each scan is placed in its own fixed-capacity slice of a [B*cap] buffer with a
validity mask.  Scans larger than the capacity are truncated (counted in
``num_dropped`` so callers can monitor; capacities are sized so this never
happens on the real datasets).

Eval-only fields (original labels, inverse maps) stay host-side Python lists,
exactly like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import numpy as np


def _level_voxel_counts(coords: np.ndarray, num_levels: int) -> np.ndarray:
    """Exact unique-voxel count of one scan at each hierarchy level.

    Level l voxels are ``unique(coords >> l)`` (the 2x-downsample chain the
    SPVCNN stages walk); coords are the dataloader's already-deduped voxel
    coords in [0, 4096)^3, so level 0 is just ``len(coords)``.  Feeds
    TPU.ADAPTIVE_LEVEL_CAPS (steps.adaptive_level_caps)."""
    counts = np.empty(num_levels, np.int64)
    counts[0] = len(coords)
    c = coords.astype(np.int64)
    key = (c[:, 0] << 24) | (c[:, 1] << 12) | c[:, 2]
    for l in range(1, num_levels):
        # >> on the packed key drops low bits of z only; rebuild per level.
        cl = c >> l
        counts[l] = len(np.unique((cl[:, 0] << 24) | (cl[:, 1] << 12)
                                  | cl[:, 2]))
    return counts


def collate_padded(samples: List[Dict], batch_size: int, point_capacity: int,
                   image_height: int, image_width: int,
                   output_orig: bool = False, output_image: bool = True,
                   capacity_buckets: tuple = (), level_counts: int = 0,
                   slot_pool=None):
    b = batch_size
    cap = point_capacity
    if capacity_buckets:
        # Static-shape bucketing (SURVEY §7 north star): pick the smallest
        # bucket that fits the batch's largest scan — gathers and GEMMs scale
        # with capacity, so small scans shouldn't pay for the worst case.
        # jax.jit retraces once per bucket (bounded by len(buckets)).
        biggest = max((len(s["coords"]) for s in samples), default=0)
        cap = None
        for bk in sorted(capacity_buckets):
            if bk >= biggest:
                cap = int(bk)
                break
        if cap is None:   # largest bucket; overflow points get dropped
            cap = int(max(capacity_buckets))
    n = b * cap
    out = {
        "coords": np.zeros((n, 3), np.int32),
        "feats": np.zeros((n, 4), np.float32),
        "seg_label": np.zeros((n,), np.int32),
        "pt_batch": np.zeros((n,), np.int32),
        "pt_valid": np.zeros((n,), bool),
        "scan_count": np.zeros((b,), np.int32),
        "num_dropped": 0,
    }
    if output_image:
        out["img"] = np.zeros((b, image_height, image_width, 3), np.float32)
        out["img_indices"] = np.zeros((n, 2), np.int32)
    if output_orig:
        out["orig_seg_label"] = []
        out["sparse_orig_points_idx"] = []
        out["inverse_map"] = []
    out["seq"] = []
    out["filename"] = []

    assert len(samples) <= b
    for i, s in enumerate(samples):
        k = len(s["coords"])
        if k > cap:
            out["num_dropped"] += k - cap
            k = cap
        lo = i * cap
        out["coords"][lo:lo + k] = s["coords"][:k]
        out["feats"][lo:lo + k, :s["feats"].shape[1]] = s["feats"][:k]
        out["seg_label"][lo:lo + k] = s["seg_label"][:k]
        out["pt_batch"][lo:lo + k] = i
        out["pt_valid"][lo:lo + k] = True
        out["scan_count"][i] = k
        if output_image:
            img = s["img"]
            if img.shape[0] == 3 and img.ndim == 3:   # CHW -> HWC safety
                img = np.moveaxis(img, 0, -1)
            h, w = img.shape[:2]
            out["img"][i, :h, :w] = img
            out["img_indices"][lo:lo + k] = s["img_indices"][:k]
        if output_orig:
            out["orig_seg_label"].append(s["orig_seg_label"])
            out["sparse_orig_points_idx"].append(s["sparse_orig_points_idx"])
            out["inverse_map"].append(s["inverse_map"])
        out["seq"].append(s.get("seq", ""))
        out["filename"].append(s.get("filename", ""))
        if level_counts:
            # Batch totals: the hierarchy keys include the batch index, so
            # per-scan unique counts sum exactly (post-truncation slice).
            # The per-scan matrix lets data-parallel trainers re-group the
            # totals per device shard (hierarchies build per device, so the
            # capacity must cover the worst shard, not the batch sum).
            out.setdefault("level_counts",
                           np.zeros(level_counts, np.int64))
            out.setdefault("level_counts_per_scan",
                           np.zeros((b, level_counts), np.int64))
            cnt = _level_voxel_counts(
                np.asarray(s["coords"][:k]), level_counts)
            out["level_counts"] += cnt
            out["level_counts_per_scan"][i] = cnt

    if slot_pool is not None:
        # Host-built group-pooled conv slot maps (ops/host_slots.py, the
        # r5 fast path): the worker walks each scan's Morton pyramid once
        # more to join ks3 neighbors and emits pre-packed [cap/8, S] maps
        # sized by the SAME capacity rule the trainer's step uses
        # (slot_pool.caps_for == steps.adaptive_level_caps, pinned by
        # test).  Requires level_counts (capacities follow the counts).
        from fusiontransformer_tpu.ops.host_slots import (
            assemble_grouped_slots, scan_levels, scan_slot_triples)
        assert level_counts >= slot_pool.num_levels or not slot_pool.adaptive, (
            "TPU.CONV_SLOT_POOL with adaptive caps needs level_counts for "
            "capacity sizing")
        tris, cnts = [], []
        for i, s in enumerate(samples):
            k = min(len(s["coords"]), cap)
            levels = scan_levels(np.asarray(s["coords"][:k]),
                                 slot_pool.num_levels)
            tris.append(scan_slot_triples(levels, slot_pool.slot_levels))
            cnts.append([len(lv["key"]) for lv in levels])
        caps = slot_pool.caps_for(
            n, out.get("level_counts", np.zeros(slot_pool.num_levels,
                                                np.int64)))
        maps, overflow = assemble_grouped_slots(
            tris, np.asarray(cnts) if cnts else
            np.zeros((0, slot_pool.num_levels), np.int64),
            caps, slot_pool.slot_levels, quantum=slot_pool.quantum)
        for l, (src, binp) in maps.items():
            out[f"gslot_src_{l}"] = src
            out[f"gslot_bin_{l}"] = binp
        out["gslot_overflow"] = overflow
    return out


def get_collate(is_train: bool, batch_size: int, point_capacity: int,
                image_height: int, image_width: int, output_image: bool = True,
                capacity_buckets: tuple = (), level_counts: int = 0,
                slot_pool=None):
    """Reference ``get_collate_scn`` analog: eval batches carry orig fields."""
    return partial(collate_padded, batch_size=batch_size,
                   point_capacity=point_capacity, image_height=image_height,
                   image_width=image_width, output_orig=not is_train,
                   output_image=output_image,
                   capacity_buckets=tuple(capacity_buckets),
                   level_counts=level_counts, slot_pool=slot_pool)
