#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship train + inference steps.

Writes a TensorBoard profile under ``/tmp/ftx_profile`` and prints an
op-level time breakdown parsed from the trace (no TensorBoard needed).

Usage: python tools/profile_step.py [train|infer] [outdir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("BENCH_BATCH", 0))  # 0 -> per-mode default below
POINTS = 18_000
CAPACITY = 20_480
NUM_CLASSES = 20


def build(mode):
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
                                                     make_eval_step,
                                                     make_train_step)
    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

    cfg = get_default_cfg()
    if mode.endswith("2d"):
        cfg.MODEL.TYPE = "ImageSegBilinear"
        cfg.MODEL.USE_FUSION = False
        cfg.MODEL.USE_LIDAR = False
        cfg.MODEL.USE_IMAGE = True
        cfg.MODEL.DUAL_HEAD = False
    else:
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
    # Mirror bench.py / bench_train.py: fused Pallas binned conv by default,
    # same A/B env knobs, same per-mode default batch (train b2, infer b1).
    global BATCH
    if BATCH == 0:
        BATCH = 2 if mode.startswith("train") else 1
    k_env = int(os.environ.get("FTX_BENCH_TAP_SLOTS", "16"))
    if k_env:
        cfg.TPU.CONV_TAP_SLOTS = (k_env, k_env, k_env, k_env, 0)
        cfg.TPU.CONV_PALLAS = os.environ.get("FTX_BENCH_PALLAS", "1") == "1"
    from fusiontransformer_tpu.ops import sparse_conv as sc_backend
    sc_backend.set_slot_backend("pallas" if cfg.TPU.CONV_PALLAS else "xla")

    ds = SyntheticSCN(split=("train",), num_scans=BATCH, num_points=POINTS)
    batch = collate_padded([ds[i] for i in range(BATCH)], BATCH, CAPACITY,
                           370, 1226)
    batch = {k: batch[k] for k in ("coords", "feats", "seg_label", "pt_batch",
                                   "pt_valid", "img", "img_indices")}
    batch = jax.device_put(batch)

    model = build_model(cfg)[0]
    caps = level_caps_from_cfg(cfg, BATCH)
    tx = optax.adam(1e-4)

    @jax.jit
    def _init(batch):
        hier = None
        if not mode.endswith("2d"):
            hier = build_hierarchy(batch["coords"], batch["pt_batch"],
                                   batch["pt_valid"], caps,
                                   tap_slots=tuple(cfg.TPU.CONV_TAP_SLOTS))
        return model.init(jax.random.PRNGKey(0), batch, hier, train=False)

    variables = jax.block_until_ready(_init(batch))
    params = variables["params"]
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.zeros((), jnp.int32))

    if mode.startswith("train"):
        step, _ = make_train_step(cfg, model, tx, BATCH)
        # donate like bench_train.py so the traced program (and its
        # persistent-cache entry) is identical to the benchmarked one.
        step = jax.jit(step, donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)

        def run():
            nonlocal state
            state, metrics = step(state, batch, rng)
            np.asarray(metrics["total_loss"])
    else:
        estep, _ = make_eval_step(cfg, model, BATCH)
        estep = jax.jit(estep)

        pred_key = "pred_2d" if mode.endswith("2d") else "pred_ensemble"

        def run():
            out = estep(state, batch)
            np.asarray(out[pred_key][:1])
    return run


def summarize(outdir, steps=3):
    """Aggregate device op time by HLO category and by source file:line
    (the trace events carry ``source`` attribution and picosecond device
    durations — far more actionable than raw fusion numbers)."""
    files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", outdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    by_anon = defaultdict(float)   # op-name breakdown of source-less time
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or not e.get("args"):
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        # Only the per-op rows: "XLA Modules"/"Steps" threads repeat the
        # same device time as whole-module / whole-step envelope events.
        # Traces without thread_name metadata leave tname empty for every
        # event, so keep the process-name exclusion as a fallback — module
        # envelopes there would otherwise double-count (advisor r3).
        if "XLA Modules" in pname or "Steps" in pname:
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if tname and "Ops" not in tname:
            continue
        if e.get("name", "").startswith("jit_"):
            continue
        a = e["args"]
        dur = float(a.get("device_duration_ps", e.get("dur", 0) * 1e6)) / 1e9
        rel = a.get("source", "?")
        if "/fusiontransformer_tpu/" in rel:
            rel = rel.split("/fusiontransformer_tpu/")[-1]
        by_src[rel] += dur
        by_cat[a.get("hlo_category", "?")] += dur
        if rel == "?":
            # strip only a literal .N uniquifier suffix so variants
            # aggregate without truncating ops whose names end in digits
            name = re.sub(r"\.\d+$", "", e.get("name", "?"))
            by_anon[name] += dur
        total += dur
    print(f"\ntrace: {path}")
    print(f"device op time: {total:.1f} ms / {steps} steps "
          f"= {total/steps:.2f} ms/step\n")
    print("by HLO category (ms/step):")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v/steps:8.3f}  {k}")
    print("\nby source (ms/step):")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:35]:
        print(f"  {v/steps:8.3f}  {k}")
    print("\nsource-less ops (ms/step):")
    for k, v in sorted(by_anon.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/steps:8.3f}  {k}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ftx_profile_" + mode
    run = build(mode)
    import jax
    run()  # compile
    run()
    with jax.profiler.trace(outdir):
        for _ in range(3):
            run()
    summarize(outdir)


if __name__ == "__main__":
    main()
