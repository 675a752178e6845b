#!/usr/bin/env python
"""Fabricate the dry-run fixtures for tools/run_real_eval.sh.

Writes, under ``--out``:
  raw/dataset/sequences/{07,01}/{velodyne,labels,image_2,calib.txt}
      -- a tiny raw-SemanticKITTI tree (the val split sequences,
         splits.py:15-24 of the reference) with in-frustum ray geometry so
         the offline preprocessor keeps a realistic fraction of points, and
  reference.pth
      -- a random-weight *reference-format* torch checkpoint
         (state_dict keys exactly as the reference's model.state_dict(),
         wrapped in a CheckpointerV2-style {"model": ...} payload,
         reference common/utils/checkpoint.py:39).

The fabricated inputs are small but structurally faithful: every byte the
real pipeline reads (bin/label/png/calib/pth) is produced in the real format.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tools"))

W, H = 1226, 370
FX = FY = 700.0  # KITTI-like focal length


def make_raw_sequence(root, seq, n_frames, n_pts, rng):
    from PIL import Image

    from fusiontransformer_tpu.data.semantic_kitti import labels as L

    seq_dir = osp.join(root, "dataset", "sequences", seq)
    for sub in ("velodyne", "labels", "image_2"):
        os.makedirs(osp.join(seq_dir, sub), exist_ok=True)

    # KITTI camera looks along +z_cam; Tr maps lidar (x fwd) to camera.
    K = np.array([[FX, 0, W / 2, 0], [0, FY, H / 2, 0], [0, 0, 1, 0]])
    Tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]])
    with open(osp.join(seq_dir, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join("0" for _ in range(12)) + "\n")
        f.write("P2: " + " ".join(str(v) for v in K.reshape(-1)) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr.reshape(-1)) + "\n")

    raw_ids = np.array(sorted(L.LEARNING_MAP.keys()))
    for i in range(n_frames):
        # ~70% of rays inside the frustum, the rest behind/outside so the
        # preprocessor's cull actually culls.
        n_in = int(n_pts * 0.7)
        depth = rng.uniform(4.0, 40.0, n_in)
        u = rng.uniform(1, W - 1, n_in)
        v = rng.uniform(1, H - 1, n_in)
        pts_in = np.stack([depth,
                           -(u - W / 2) * depth / FX,
                           -(v - H / 2) * depth / FY], 1)
        pts_out = rng.uniform(-40, 0, (n_pts - n_in, 3))  # behind the car
        pts = np.concatenate([pts_in, pts_out], 0)
        intensity = rng.rand(n_pts)
        scan = np.concatenate([pts, intensity[:, None]], 1).astype(np.float32)
        scan.tofile(osp.join(seq_dir, "velodyne", f"{i:06d}.bin"))
        lab = rng.choice(raw_ids, n_pts).astype(np.uint32)
        # Upper 16 bits carry instance ids in the real format; set some.
        lab = lab | (rng.randint(0, 4, n_pts).astype(np.uint32) << 16)
        lab.tofile(osp.join(seq_dir, "labels", f"{i:06d}.label"))
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(osp.join(seq_dir, "image_2", f"{i:06d}.png"))


def make_reference_checkpoint(path, cfg_path, seed=0):
    import torch

    import reference_torch as rt

    mt = _model_type(cfg_path)
    if mt == "LidarSeg":
        model = rt.LidarSegRef(num_classes=20)
    elif mt in ("EarlyFusionTransformer", "MiddleFusionTransformer",
                "LateFusionTransformer"):
        fusion = mt.replace("FusionTransformer", "").lower()
        model = rt.FusionTransformerRef(fusion, num_classes=20,
                                        dual_head=True, img_hw=(H, W))
    else:
        raise SystemExit(f"unsupported MODEL.TYPE for the drill: {mt}")
    rt.randomize_(model, seed=seed)
    # CheckpointerV2 payload shape (reference common/utils/checkpoint.py:39).
    torch.save({"model": model.state_dict(), "epoch": 0}, path)


def _model_type(cfg_path):
    import yaml
    with open(cfg_path) as f:
        doc = yaml.safe_load(f)
    return doc.get("MODEL", {}).get("TYPE", "MiddleFusionTransformer")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--points", type=int, default=3000)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    root = osp.join(args.out, "raw")
    from fusiontransformer_tpu.data.semantic_kitti import splits
    for seq in splits.regular.val:
        make_raw_sequence(root, seq, args.frames, args.points, rng)
    make_reference_checkpoint(osp.join(args.out, "reference.pth"), args.cfg)
    print(f"fabricated raw val sequences {splits.regular.val} + reference.pth "
          f"under {args.out}")


if __name__ == "__main__":
    main()
