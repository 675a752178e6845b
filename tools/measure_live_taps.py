#!/usr/bin/env python
"""Measure ks3 live-tap distributions on synthetic bench scans (pure numpy).

Decides the r5 host-built-map design (ROADMAP "Next round (r5)"):
* per-voxel live-tap counts per level (the K-slot sizing data);
* per-BATCH max live taps -> viability of a per-batch K ladder
  (K < 16 only pays if whole batches stay under it);
* per-8-voxel-group live-tap SUMS -> viability of group-pooled slots
  (slots allocated per kernel group instead of per voxel: the pool size S
  follows the group max of the sum, which concentrates ~8x tighter than
  the per-voxel max).

Groups are the fused kernel's native 8-voxel rows in MORTON order — the
same adjacency the device build produces — so the numbers here are exactly
what the kernel would see.
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fusiontransformer_tpu.data.synthetic import SyntheticSCN

OFFS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)]


def morton_key(c):
    c = c.astype(np.int64)
    key = np.zeros(len(c), np.int64)
    for b in range(12):
        key |= (((c[:, 0] >> b) & 1) << (3 * b + 2)) \
            | (((c[:, 1] >> b) & 1) << (3 * b + 1)) \
            | (((c[:, 2] >> b) & 1) << (3 * b))
    return key


def live_counts(coords, limit):
    """[V] number of live ks3 taps (incl. self) per voxel, Morton order."""
    key = morton_key(coords)
    order = np.argsort(key, kind="stable")
    coords = coords[order]
    key = key[order]
    live = np.zeros(len(coords), np.int64)
    for (dx, dy, dz) in OFFS:
        q = coords + np.array([dx, dy, dz], coords.dtype)
        inb = np.all((q >= 0) & (q < limit), axis=1)
        qk = morton_key(q)
        pos = np.searchsorted(key, qk)
        pos = np.minimum(pos, len(key) - 1)
        live += (key[pos] == qk) & inb
    return live


def main():
    num_scans = int(os.environ.get("SCANS", 24))
    batch = int(os.environ.get("BATCH", 2))
    ds = SyntheticSCN(split=("train",), num_scans=num_scans,
                      num_points=18_000)
    per_level_all = {l: [] for l in range(4)}
    batch_max = {l: [] for l in range(4)}
    group_tail = {l: [] for l in range(4)}   # per-batch max of 8-group sums

    for b0 in range(0, num_scans, batch):
        scans = [np.asarray(ds[i]["coords"]) for i in
                 range(b0, min(b0 + batch, num_scans))]
        for l in range(4):
            lv_all = []
            for c in scans:
                cl = np.unique(c >> l, axis=0) if l else c
                lv = live_counts(cl, 4096 >> l)
                lv_all.append(lv)
            cat = np.concatenate(lv_all)
            per_level_all[l].append(cat)
            batch_max[l].append(cat.max())
            # kernel groups: 8 consecutive voxels in Morton order, scans
            # concatenated (batch-major, matching the device layout)
            g = np.concatenate([np.pad(lv, (0, (-len(lv)) % 8))
                                for lv in lv_all])
            gsum = g.reshape(-1, 8).sum(1)
            group_tail[l].append(gsum.max())

    print(f"== {num_scans} synthetic scans, batch {batch} ==")
    for l in range(4):
        allv = np.concatenate(per_level_all[l])
        bm = np.array(batch_max[l])
        gt = np.array(group_tail[l])
        print(f"L{l}: voxels/scan~{len(allv)//num_scans} "
              f"live mean {allv.mean():.2f} p50 {np.percentile(allv,50):.0f} "
              f"p99 {np.percentile(allv,99):.0f} max {allv.max()}")
        print(f"    per-batch MAX: min {bm.min()} med {np.median(bm):.0f} "
              f"max {bm.max()}  (K ladder viable iff this is usually < 16)")
        print(f"    per-batch max 8-GROUP SUM: min {gt.min()} "
              f"med {np.median(gt):.0f} max {gt.max()} / 128 slots "
              f"(group pool S ladder viable iff usually << 128)")


if __name__ == "__main__":
    main()
