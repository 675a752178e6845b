#!/usr/bin/env python
"""Serving-path benchmark at flagship shapes (one chip).

Unlike bench.py (device-step throughput of the jitted forward), this
measures the DEPLOYED path: raw scan record in → host preprocessing
(normalize/scale/quantize) → bucket-padded device step → devoxelize back to
raw points.  Two numbers:

* sequential engine.predict latency (p50/p95) — what a single caller sees;
* batching-server throughput with preprocessing overlapped against the
  device step — what a loaded endpoint sustains.

Usage: python tools/bench_serve.py [n_scans]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POINTS = 18_000
CAPACITY = 20_480
IMG_H, IMG_W = 370, 1226


def flagship_cfg():
    from fusiontransformer_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "MiddleFusionTransformer"
    cfg.MODEL.NUM_CLASSES = 20
    cfg.MODEL.DUAL_HEAD = True
    cfg.MODEL.USE_LIDAR = True
    cfg.MODEL.USE_IMAGE = True
    cfg.MODEL.USE_FUSION = True
    cfg.MODEL.middle_feat_block_number = 5
    cfg.MODEL.late_feat_block_number = 11
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.SyntheticSCN.image_height = IMG_H
    cfg.DATASET.SyntheticSCN.image_width = IMG_W
    cfg.TPU.POINT_CAPACITY = CAPACITY
    # Measured worst occupancy over this bench's 32 scans +10% margin
    # (worst nvalid_raw 15535/11865/7756/4196/1698): serving must be
    # lossless, so these are a touch wider than bench.py's fractions.
    cfg.TPU.L0_CAPACITY_FRACTION = 0.85
    cfg.TPU.LEVEL_CAPACITY_FRACTIONS = (0.75, 0.66, 0.54, 0.41)
    cfg.freeze()
    return cfg


def make_records(n):
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN

    gen = SyntheticSCN(split=("test",), num_scans=n, num_points=POINTS,
                       image_height=IMG_H, image_width=IMG_W)
    records = []
    for i in range(n):
        rng = np.random.RandomState(7_000 + i)
        points, _, _ = gen._make_scan(rng)
        records.append({
            "points": points,
            "feats": np.concatenate(
                [points, rng.rand(len(points), 1).astype(np.float32)], 1),
            "img": rng.rand(IMG_H, IMG_W, 3).astype(np.float32),
            "points_img": gen._project(points),
        })
    return records


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    # Stall watchdog (same as bench.py / bench_train.py): the r5 serving
    # re-measure recorded a 75 s wedged sync mid-window — with the
    # watchdog a wedged run self-reports within a heartbeat instead of
    # silently poisoning the percentiles.
    from fusiontransformer_tpu.utils.watchdog import Watchdog
    wd = Watchdog()
    wd.phase("backend init + engine build", budget_s=900)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.serving import InferenceEngine, InferenceServer

    cfg = flagship_cfg()
    model = build_model(cfg)[0]
    state = init_train_state(cfg, model, None, 1)
    engine = InferenceEngine(cfg, params=state.params,
                             batch_stats=state.batch_stats, batch_size=1)

    records = make_records(n_scans)
    print("warmup (compile)...", file=sys.stderr, flush=True)
    wd.phase("warmup compile", budget_s=1200)
    t0 = time.perf_counter()
    engine.predict(records[0])
    print(f"  {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    wd.phase("measure sequential", budget_s=600)

    # Host-preprocess-only cost (what the server overlaps away).
    t0 = time.perf_counter()
    for r in records[:8]:
        engine.preprocess(r)
    pre_ms = (time.perf_counter() - t0) / 8 * 1e3

    # Sequential single-caller latency.
    lats = []
    for r in records:
        t0 = time.perf_counter()
        engine.predict(r)
        lats.append(time.perf_counter() - t0)
    lats = np.asarray(lats)

    # Loaded-endpoint throughput (preproc threads overlap the device step).
    wd.phase("measure server", budget_s=600)
    server = InferenceServer(engine, preproc_workers=2, batch_wait_ms=0.5)
    try:
        t0 = time.perf_counter()
        futs = [server.submit(r) for r in records]
        for f in futs:
            f.result(timeout=600)
        wall = time.perf_counter() - t0
        sstats = server.stats()
    finally:
        server.close()

    wd.stop()
    assert engine.stats()["voxel_overflow"] == 0
    print(json.dumps({
        "metric": "middlefusion_serving",
        "host_preprocess_ms": round(pre_ms, 2),
        "sequential_p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 2),
        "sequential_p95_ms": round(float(np.percentile(lats, 95)) * 1e3, 2),
        "sequential_scans_per_sec": round(len(lats) / lats.sum(), 2),
        "server_scans_per_sec": round(n_scans / wall, 2),
        "server_p50_ms": sstats.get("latency_ms", {}).get("p50"),
    }))


if __name__ == "__main__":
    main()
