#!/usr/bin/env python
"""Per-model-family inference throughput on one chip (BASELINE.md table).

Measures batch-1 pipelined scans/sec for each reference config family at the
flagship compute shapes (KITTI-sized synthetic scans):
  LidarSeg (3D only), ImageSegBilinear (2D only), Late/Early/Middle fusion.

Usage: python tools/bench_models.py [family ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("FT_BENCH_BATCH", "1"))
POINTS = 18_000
CAPACITY = 20_480

FAMILIES = {
    # family: (USE_LIDAR, USE_IMAGE, USE_FUSION, MODEL.TYPE)
    "lidar": (True, False, False, "LidarSeg"),
    "image": (False, True, False, "ImageSegBilinear"),
    "latefusion": (True, True, True, "LateFusionTransformer"),
    "earlyfusion": (True, True, True, "EarlyFusionTransformer"),
    "middlefusion": (True, True, True, "MiddleFusionTransformer"),
    # NuScenes flagship shapes (configs/nuscenes/middlefusion.yaml): 5 merged
    # classes, 400x225 resized front-cam images, 32-beam frustum scans
    # (~6-8k points vs KITTI's ~18k).
    "nuscenes_middlefusion": (True, True, True, "MiddleFusionTransformer"),
}

# Per-family shape overrides: (points, capacity, img_h, img_w, num_classes).
SHAPES = {
    "nuscenes_middlefusion": (7_000, 8_192, 225, 400, 5),
}

# Per-family capacity fractions (L0, per-level).  KITTI-sized 18k-point
# scans merge hard under downsampling (measured bench taper); NuScenes
# frustum scans barely merge (L1 uniques ~ 0.87x L0 — same finding as the
# synthetic.yaml comment), so the KITTI taper silently TRUNCATED levels at
# these shapes (r2-r4 measured 93-95 scans/s on lossy clamped hierarchies;
# the r5 host-built slot maps' overflow assert caught it).  Frustum shapes
# get near-flat fractions; lossless-ness is asserted below.
FRACTIONS = {
    "default": (0.85, (0.67, 0.67, 0.55, 0.42)),
    "nuscenes_middlefusion": (1.0, (0.9, 0.8, 0.7, 0.6)),
}


def bench_family(name):
    import jax
    import jax.numpy as jnp

    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.data.collate import collate_padded
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.steps import (level_caps_from_cfg,
                                                     make_eval_step)
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.modules.steps import TrainState
    import optax

    use_lidar, use_image, use_fusion, mtype = FAMILIES[name]
    points, capacity, img_h, img_w, n_cls = SHAPES.get(
        name, (POINTS, CAPACITY, 370, 1226, 20))
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = mtype
    cfg.MODEL.NUM_CLASSES = n_cls
    cfg.MODEL.USE_LIDAR = use_lidar
    cfg.MODEL.USE_IMAGE = use_image
    cfg.MODEL.USE_FUSION = use_fusion
    cfg.MODEL.DUAL_HEAD = use_fusion
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.SyntheticSCN.image_height = img_h
    cfg.DATASET.SyntheticSCN.image_width = img_w
    if use_fusion or use_image:
        cfg.MODEL.late_feat_block_number = 11
    if mtype in ("MiddleFusionTransformer", "EarlyFusionTransformer"):
        cfg.MODEL.middle_feat_block_number = \
            0 if mtype == "EarlyFusionTransformer" else 5
    cfg.VAL.BATCH_SIZE = BATCH
    cfg.TPU.POINT_CAPACITY = capacity
    l0_frac, lvl_fracs = FRACTIONS.get(name, FRACTIONS["default"])
    cfg.TPU.L0_CAPACITY_FRACTION = l0_frac
    cfg.TPU.LEVEL_CAPACITY_FRACTIONS = lvl_fracs

    ds = SyntheticSCN(split=("train",), num_scans=BATCH, num_points=points,
                      image_width=img_w, image_height=img_h)
    batch = collate_padded([ds[i] for i in range(BATCH)], BATCH, capacity,
                           img_h, img_w)
    batch = {k: batch[k] for k in ("coords", "feats", "seg_label", "pt_batch",
                                   "pt_valid", "img", "img_indices")}
    # Product default: host-built group-pooled slot maps (static caps to
    # match this bench's eval step; FTX_BENCH_SLOT_POOL=0 to A/B off).
    if use_lidar and os.environ.get("FTX_BENCH_SLOT_POOL", "1") == "1":
        from fusiontransformer_tpu.ops.host_slots import build_batch_slot_maps
        caps = level_caps_from_cfg(cfg, BATCH)
        maps, overflow = build_batch_slot_maps(
            [np.asarray(ds[i]["coords"])[:capacity] for i in range(BATCH)],
            caps, slot_levels=[l for l, k in
                               enumerate(cfg.TPU.CONV_TAP_SLOTS) if k])
        assert overflow == 0, overflow
        for l, (src, binp) in maps.items():
            batch[f"gslot_src_{l}"] = src
            batch[f"gslot_bin_{l}"] = binp
    batch = jax.device_put(batch)

    model = build_model(cfg)[0]
    tx = optax.adam(1e-4)
    state = init_train_state(cfg, model, tx, BATCH)
    estep = jax.jit(make_eval_step(cfg, model, BATCH)[0])

    flops = None
    try:
        ca = estep.lower(state, batch).compile().cost_analysis()
        if ca:
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    out = estep(state, batch)
    _ = np.asarray(out["pred_ensemble" if use_fusion else (
        "pred_3d" if use_lidar else "pred_2d")][:1])
    iters = 20
    t0 = time.perf_counter()
    outs = [estep(state, batch) for _ in range(iters)]
    key = "pred_ensemble" if use_fusion else (
        "pred_3d" if use_lidar else "pred_2d")
    _ = np.asarray(outs[-1][key][:1])
    dt = (time.perf_counter() - t0) / iters
    mfu = ""
    if flops:
        mfu = (f", {flops/BATCH/1e9:.1f} GFLOP/scan, "
               f"MFU {100.0*flops/dt/197e12:.2f}%")
    print(f"{name}: {BATCH/dt:.2f} scans/s ({dt*1e3:.1f} ms/batch of "
          f"{BATCH}{mfu})", flush=True)
    return BATCH / dt


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    names = sys.argv[1:] or list(FAMILIES)
    for n in names:
        bench_family(n)


if __name__ == "__main__":
    main()
