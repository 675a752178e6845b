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


def runtime_caps(bucket, frac0, fracs):
    """EXACT runtime cap ladder for a bucket-sized point buffer — delegates
    to ``modules.steps.level_caps_for_n`` so the tool can never verify a
    ladder against different rounding than the trainer will use (the
    runtime rounds caps to the NEAREST 128, which can land 128 rows below
    a ceil-aligned value)."""
    from types import SimpleNamespace

    from fusiontransformer_tpu.modules.steps import level_caps_for_n

    cfg = SimpleNamespace(TPU=SimpleNamespace(
        L0_CAPACITY_FRACTION=frac0, LEVEL_CAPACITY_FRACTIONS=list(fracs)))
    return list(level_caps_for_n(cfg, int(bucket)))


def recommend(stats, percentiles=(60, 85, 100), headroom=1.15,
              l0_fraction=True):
    """Bucket ladder + level fractions covering every measured scan.

    Fractions are chosen, then pushed up in 1e-3 steps until the caps the
    RUNTIME derives from them (round-to-nearest-128 chaining) cover every
    measured scan — the published fractions are exactly what lands in the
    YAML, so what this tool verifies is what the trainer runs."""
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
    frac0 = round(min(frac0, 1.0), 3)
    # L0 first: nearest-128 rounding can undershoot the measured max, so bump
    # the published fraction until the RUNTIME caps cover every scan.
    while frac0 < 1.0:
        caps_try = {b: runtime_caps(b, frac0, []) for b in buckets}
        if all(stats[i, 1] <= caps_try[route[i]][0]
               for i in range(len(stats))):
            break
        frac0 = round(min(frac0 + 0.001, 1.0), 3)
    fracs = []
    for l in range(1, num_levels):
        caps_b = {b: runtime_caps(b, frac0, fracs) for b in buckets}
        f = float(np.max([stats[i, l + 1] / caps_b[route[i]][l - 1]
                          for i in range(len(stats))])) * headroom
        f = round(min(f, 1.0), 3)
        while f < 1.0:
            caps_try = {b: runtime_caps(b, frac0, fracs + [f]) for b in buckets}
            if all(stats[i, l + 1] <= caps_try[route[i]][l]
                   for i in range(len(stats))):
                break
            f = round(min(f + 0.001, 1.0), 3)
        fracs.append(f)
    caps = {b: runtime_caps(b, frac0, fracs) for b in buckets}
    return {
        "buckets": buckets,
        "point_capacity": buckets[-1],
        "l0_fraction": frac0,
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
