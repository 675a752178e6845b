#!/usr/bin/env python
"""Training-step throughput bench (fwd+bwd+optimizer) for the flagship model.

Companion to ../bench.py (which measures inference — the driver-facing
metric); this measures the full jitted train step at the same shapes so
optimization work can be tracked on both paths.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Batch sweep on v5e, r4 (Pallas fused convs + adaptive caps): train
# scans/s 21.46 @ b1, 21.04 @ b2, 21.69 @ b3 — flat within ~3%: gathers
# scale with capacity and only the kernel/dispatch constants amortize.
# (r2 sweep had b2 optimal at 17.96/19.01/18.05 for b1/b2/b4.)
BATCH = int(os.environ.get("BENCH_BATCH", 3))
POINTS = 18_000
CAPACITY = 20_480
NUM_CLASSES = 20


def main():
    # Stall watchdog (same as bench.py): a wedged tunnel self-reports and
    # exits 3 instead of hanging silently.  Backend init through the axon
    # tunnel was observed to take 8 minutes and then RECOVER (r5), so its
    # budget is 900 s, not bench.py's 300.
    from fusiontransformer_tpu.utils.watchdog import Watchdog
    wd = Watchdog()
    wd.phase("backend init", budget_s=900)
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.data.collate import collate_padded
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.steps import (TrainState,
                                                     level_caps_from_cfg,
                                                     make_train_step)

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "MiddleFusionTransformer"
    cfg.MODEL.USE_FUSION = True
    cfg.MODEL.USE_LIDAR = True
    cfg.MODEL.USE_IMAGE = True
    cfg.MODEL.DUAL_HEAD = True
    cfg.MODEL.middle_feat_block_number = 5
    cfg.MODEL.late_feat_block_number = 11
    cfg.TRAIN.FusionTransformer.lambda_xm = 0.1
    cfg.TPU.POINT_CAPACITY = CAPACITY
    cfg.TPU.L0_CAPACITY_FRACTION = 0.85
    cfg.TPU.LEVEL_CAPACITY_FRACTIONS = (0.67, 0.67, 0.55, 0.42)
    # Fused Pallas binned conv by default (same A/B envs as bench.py).
    k_env = int(os.environ.get("FTX_BENCH_TAP_SLOTS", "16"))
    if k_env:
        cfg.TPU.CONV_TAP_SLOTS = (k_env, k_env, k_env, k_env, 0)
        cfg.TPU.CONV_PALLAS = os.environ.get("FTX_BENCH_PALLAS", "1") == "1"
    from fusiontransformer_tpu.ops import sparse_conv as sc_backend
    sc_backend.set_slot_backend("pallas" if cfg.TPU.CONV_PALLAS else "xla")

    ds = SyntheticSCN(split=("train",), num_scans=BATCH, num_points=POINTS)
    n_levels = len(level_caps_from_cfg(cfg, BATCH))
    batch = collate_padded([ds[i] for i in range(BATCH)], BATCH, CAPACITY,
                           370, 1226, level_counts=n_levels)
    # Occupancy-compacted capacities, exactly as the product trainer sizes
    # them (TPU.ADAPTIVE_LEVEL_CAPS, default on): gathers/GEMMs scale with
    # capacity, so the bench should run at the caps users actually get.
    # FTX_BENCH_ADAPTIVE=0 A/Bs the static fraction-derived caps.
    if os.environ.get("FTX_BENCH_ADAPTIVE", "1") == "1":
        from fusiontransformer_tpu.modules.steps import adaptive_level_caps
        caps = adaptive_level_caps(cfg, BATCH * CAPACITY,
                                   batch["level_counts"])
    else:
        caps = level_caps_from_cfg(cfg, BATCH)
    print(f"level caps: {caps}", file=sys.stderr)
    batch = {k: batch[k] for k in ("coords", "feats", "seg_label", "pt_batch",
                                   "pt_valid", "img", "img_indices")}
    # FTX_BENCH_SLOT_POOL=1: host-built group-pooled slot maps (the r5
    # swing, ops/host_slots.py) — exact loader-side compaction replaces the
    # per-voxel K=16 device maps.  The host build is timed and reported
    # (in production it overlaps the device step via the MP loader).
    if os.environ.get("FTX_BENCH_SLOT_POOL", "1") == "1":
        from fusiontransformer_tpu.ops.host_slots import build_batch_slot_maps
        coords_list = [np.asarray(ds[i]["coords"])[:CAPACITY]
                       for i in range(BATCH)]
        t0 = time.time()
        maps, overflow = build_batch_slot_maps(coords_list, caps,
                                               slot_levels=[0, 1, 2, 3])
        host_ms = (time.time() - t0) * 1e3
        assert overflow == 0, overflow
        sizes = {l: maps[l][0].shape[1] for l in maps}
        nbytes = sum(a.nbytes + b.nbytes for a, b in maps.values())
        print(f"host slot maps: {host_ms:.1f} ms/batch, pool sizes {sizes}, "
              f"{nbytes/1e6:.1f} MB H2D (vs 128 rows/group at K=16)",
              file=sys.stderr)
        for l, (src, binp) in maps.items():
            batch[f"gslot_src_{l}"] = src
            batch[f"gslot_bin_{l}"] = binp
    batch = jax.device_put(batch)

    model = build_model(cfg)[0]
    tx = optax.adam(1e-4)

    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

    @jax.jit
    def _init(batch):
        hier = build_hierarchy(batch["coords"], batch["pt_batch"],
                               batch["pt_valid"], caps,
                               tap_slots=tuple(cfg.TPU.CONV_TAP_SLOTS))
        return model.init(jax.random.PRNGKey(0), batch, hier, train=False)

    wd.phase("init compile+run", budget_s=900)
    t0 = time.time()
    variables = jax.block_until_ready(_init(batch))
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)
    params = variables["params"]
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.zeros((), jnp.int32))

    step, _ = make_train_step(cfg, model, tx, BATCH, level_caps=caps)
    step = jax.jit(step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    wd.phase("train-step compile", budget_s=1200)
    flops = None
    try:
        ca = step.lower(state, batch, rng).compile().cost_analysis()
        if ca:
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    t0 = time.time()
    state, metrics = step(state, batch, rng)
    np.asarray(metrics["total_loss"])  # force completion (axon quirk)
    print(f"compile+first step {time.time()-t0:.1f}s", file=sys.stderr)
    assert int(np.asarray(metrics["voxel_overflow"])) == 0

    wd.phase("measure", budget_s=300)
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    np.asarray(metrics["total_loss"])
    n = 20
    t0 = time.time()
    for _ in range(n):
        state, metrics = step(state, batch, rng)
    np.asarray(metrics["total_loss"])
    dt = (time.time() - t0) / n
    wd.stop()
    mfu = ""
    if flops:
        mfu = (f"  {flops/BATCH/1e9:.1f} GFLOP/scan"
               f"  MFU {100.0*flops/dt/197e12:.2f}%")
    print(f"train step: {dt*1e3:.1f} ms/step  "
          f"{BATCH/dt:.2f} scans/s (batch {BATCH}){mfu}")


if __name__ == "__main__":
    main()
