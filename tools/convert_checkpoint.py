#!/usr/bin/env python
"""Convert a trained reference FusionTransformer checkpoint to this framework.

Takes a torch ``.pth`` (either a raw ``state_dict`` or a CheckpointerV2
payload with a ``model`` entry, reference ``common/utils/checkpoint.py:39``)
and writes an orbax checkpoint that ``fusiontransformer_tpu.test``/``train``
can load (``--ckpt`` / RESUME_PATH) — the migration path for users switching
from the reference with trained weights.

Usage:
  python tools/convert_checkpoint.py --cfg configs/semantic_kitti/middlefusion.yaml \
      --src /path/to/model000095.pth --out /path/to/converted_ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, help="config of the target model")
    ap.add_argument("--src", required=True, help="reference .pth checkpoint")
    ap.add_argument("--out", required=True, help="output checkpoint directory")
    ap.add_argument("opts", nargs=argparse.REMAINDER,
                    help="KEY VALUE config overrides")
    args = ap.parse_args()

    import jax

    from fusiontransformer_tpu.train import load_cfg
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.solver.build import build_optimizer
    from fusiontransformer_tpu.utils import torch_convert as tc
    from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2

    cfg = load_cfg(args.cfg, args.opts)
    sd = tc.load_torch_state_dict(args.src)

    mt = cfg.MODEL.TYPE
    if mt == "LidarSeg":
        params, stats = tc.convert_lidarseg(sd)
    elif mt in ("EarlyFusionTransformer", "MiddleFusionTransformer",
                "LateFusionTransformer"):
        fusion = mt.replace("FusionTransformer", "").lower()
        params, stats = tc.convert_fusion_model(
            sd, fusion,
            middle_block=cfg.MODEL.middle_feat_block_number,
            late_block=cfg.MODEL.late_feat_block_number or 11)
    else:
        raise SystemExit(f"unsupported MODEL.TYPE for conversion: {mt}")

    # Initialize the target variables tree and merge the converted leaves so
    # shapes are validated leaf by leaf.
    model = build_model(cfg)[0]
    tx = build_optimizer(cfg)[0]
    state = init_train_state(cfg, model, tx, cfg.TRAIN.BATCH_SIZE)
    tgt_p = jax.tree_util.tree_map(np.asarray, state.params)
    tgt_s = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    n_p = tc.merge_params(tgt_p, params)
    n_s = tc.merge_params(tgt_s, stats)
    total_p = len(jax.tree_util.tree_leaves(tgt_p))
    total_s = len(jax.tree_util.tree_leaves(tgt_s))
    print(f"merged {n_p}/{total_p} param leaves, {n_s}/{total_s} stat leaves")
    if n_p < total_p:
        print("WARNING: some target params were not covered by the source "
              "checkpoint (randomly initialized leaves remain)")

    ckpt = CheckpointerV2(save_dir=args.out)
    ckpt.save("model_converted",
              tree={"params": tgt_p, "batch_stats": tgt_s, "epoch": 0})
    print(f"wrote converted checkpoint under {args.out}")


if __name__ == "__main__":
    main()
