#!/usr/bin/env python
"""Derive TPU.CAPACITY_BUCKETS + level-capacity fractions from measured
per-scan size distributions (VERDICT r1 #6: ladders must come from data,
not guesses).

Walks the configured dataset's TRAIN pipeline (augmentation included — it
changes voxel counts), records per-scan point counts and per-level unique
voxel counts, and prints a YAML-pasteable ``TPU`` section where

* buckets sit at chosen percentiles of the point-count distribution
  (aligned up to 128 rows, with headroom);
* each level's capacity fraction is the smallest value that covers EVERY
  measured scan routed to its bucket, times a safety headroom;

so the resulting ladder has measured overflow = 0 on the sampled draws.
Works against the synthetic generator (hermetic) or a real preprocessed
SemanticKITTI / NuScenes directory once one exists — same CLI.

Usage:
    python tools/derive_buckets.py --cfg configs/semantic_kitti/synthetic.yaml \
        [--samples 512] [--percentiles 60 85 100] [--headroom 1.15]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def level_voxel_counts(coords, num_levels):
    """Unique-voxel count at each octree level (level 0 = input coords)."""
    c = np.asarray(coords, np.int64)
    out = []
    for l in range(num_levels):
        cl = c >> l
        keys = (cl[:, 0] << 28) | (cl[:, 1] << 14) | cl[:, 2]
        out.append(len(np.unique(keys)))
    return out


def measure(dataset, samples, num_levels, seed=0):
    """[samples, 1+num_levels] array: n_points then per-level voxel counts."""
    rows = []
    n = len(dataset)
    for i in range(samples):
        item = dataset[i % n]
        coords = item["coords"]
        rows.append([len(coords)] + level_voxel_counts(coords, num_levels))
    return np.asarray(rows, np.int64)


def _align(x, a=128):
    return int(-(-int(x) // a) * a)


def recommend(stats, percentiles=(60, 85, 100), headroom=1.15,
              l0_fraction=True):
    """Bucket ladder + level fractions covering every measured scan."""
    npts = stats[:, 0]
    buckets = sorted({_align(np.percentile(npts, p) * headroom)
                      for p in percentiles})
    # Route each measured scan to its bucket.
    route = np.array([min((b for b in buckets if b >= n), default=buckets[-1])
                      for n in npts])
    num_levels = stats.shape[1] - 1
    # L0: voxels are <= points; the binding scans sit just under a bucket
    # boundary, so the fraction is max over scans of count0/bucket.
    frac0 = float(np.max(stats[:, 1] / route)) * headroom if l0_fraction else 1.0
    frac0 = min(frac0, 1.0)
    caps = {b: [_align(b * frac0)] for b in buckets}
    fracs = []
    for l in range(1, num_levels):
        f = float(np.max([stats[i, l + 1] / caps[route[i]][l - 1]
                          for i in range(len(stats))])) * headroom
        f = min(f, 1.0)
        fracs.append(round(f, 3))
        for b in buckets:
            caps[b].append(_align(caps[b][l - 1] * f))
    return {
        "buckets": buckets,
        "point_capacity": buckets[-1],
        "l0_fraction": round(frac0, 3),
        "fractions": fracs,
        "caps_per_bucket": caps,
    }


def verify_zero_overflow(stats, rec):
    """Every measured scan fits its bucket's caps at every level."""
    route = np.array([min((b for b in rec["buckets"] if b >= n),
                          default=rec["buckets"][-1]) for n in stats[:, 0]])
    bad = 0
    for i in range(len(stats)):
        caps = rec["caps_per_bucket"][route[i]]
        for l in range(len(caps)):
            if stats[i, l + 1] > caps[l]:
                bad += 1
                break
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--percentiles", type=float, nargs="+",
                    default=[60, 85, 100])
    ap.add_argument("--headroom", type=float, default=1.15)
    args = ap.parse_args()

    from fusiontransformer_tpu.data.build import build_dataloader
    from fusiontransformer_tpu.train import load_cfg

    cfg = load_cfg(args.cfg, [])
    loader = build_dataloader(cfg, mode="train")
    dataset = loader.dataset
    num_levels = len(cfg.TPU.LEVEL_CAPACITY_FRACTIONS) + 1

    print(f"measuring {args.samples} scans of {type(dataset).__name__} ...")
    stats = measure(dataset, args.samples, num_levels)
    print(f"points/scan: p50={np.percentile(stats[:, 0], 50):.0f} "
          f"p90={np.percentile(stats[:, 0], 90):.0f} "
          f"max={stats[:, 0].max()}")
    rec = recommend(stats, tuple(args.percentiles), args.headroom)
    assert verify_zero_overflow(stats, rec) == 0

    print("\n# Paste into the config (measured, headroom "
          f"{args.headroom}x over {args.samples} draws):")
    print("TPU:")
    print(f"  POINT_CAPACITY: {rec['point_capacity']}")
    print(f"  CAPACITY_BUCKETS: {tuple(rec['buckets'])}")
    print(f"  L0_CAPACITY_FRACTION: {rec['l0_fraction']}")
    print(f"  LEVEL_CAPACITY_FRACTIONS: {tuple(rec['fractions'])}")


if __name__ == "__main__":
    main()
