"""Integration test: raw KITTI tree -> offline preprocess -> dataset ->
padded collate.  Uses a tiny fabricated dataset (velodyne .bin, .label,
image_2 .png, calib.txt) so the full disk pipeline is exercised hermetically.
"""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from fusiontransformer_tpu.data.collate import get_collate
from fusiontransformer_tpu.data.semantic_kitti import labels as L
from fusiontransformer_tpu.data.semantic_kitti.preprocess import preprocess
from fusiontransformer_tpu.data.semantic_kitti.semantic_kitti_dataloader import (
    SemanticKITTISCN)

W, H = 320, 96
FX = FY = 180.0


def _make_raw_kitti(root, seq="07", n_frames=3, n_pts=500, rng=None):
    rng = rng or np.random.RandomState(0)
    seq_dir = osp.join(root, "dataset", "sequences", seq)
    for sub in ("velodyne", "labels", "image_2"):
        os.makedirs(osp.join(seq_dir, sub), exist_ok=True)

    # Simple calib: P2 = [K | 0] with cam looking down +x? KITTI camera looks
    # along +z_cam; Tr maps lidar (x fwd) to camera (z fwd).
    K = np.array([[FX, 0, W / 2, 0], [0, FY, H / 2, 0], [0, 0, 1, 0]])
    Tr = np.array([[0, -1, 0, 0],    # x_cam = -y_lidar
                   [0, 0, -1, 0],    # y_cam = -z_lidar
                   [1, 0, 0, 0]])    # z_cam = +x_lidar
    with open(osp.join(seq_dir, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join("0" for _ in range(12)) + "\n")
        f.write("P2: " + " ".join(str(v) for v in K.reshape(-1)) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr.reshape(-1)) + "\n")

    raw_ids = np.array(sorted(L.LEARNING_MAP.keys()))
    for i in range(n_frames):
        depth = rng.uniform(4.0, 30.0, n_pts)
        u = rng.uniform(1, W - 1, n_pts)
        v = rng.uniform(1, H - 1, n_pts)
        x = depth
        y = -(u - W / 2) * depth / FX
        z = -(v - H / 2) * depth / FY
        intensity = rng.rand(n_pts).astype(np.float32)
        scan = np.stack([x, y, z, intensity], 1).astype(np.float32)
        scan.tofile(osp.join(seq_dir, "velodyne", f"{i:06d}.bin"))
        labels = rng.choice(raw_ids, n_pts).astype(np.uint32)
        labels.tofile(osp.join(seq_dir, "labels", f"{i:06d}.label"))
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(osp.join(seq_dir, "image_2", f"{i:06d}.png"))
    return seq_dir


def test_preprocess_then_load_then_collate(tmp_path, rng):
    root = str(tmp_path / "kitti")
    out = str(tmp_path / "preprocessed")
    _make_raw_kitti(root, rng=rng)

    preprocess("train", root, out, W, H, num_workers=2, debug=True)
    files = sorted((tmp_path / "preprocessed" / "07").glob("*.pkl"))
    assert len(files) == 3

    ds = SemanticKITTISCN(split=("train",), preprocess_dir=out,
                          semantic_kitti_dir=root, image_width=W,
                          image_height=H, output_orig=True, debug=True)
    assert len(ds) == 3
    item = ds[0]
    k = len(item["coords"])
    assert k > 100
    assert item["feats"].shape == (k, 4)
    assert item["img"].shape == (H, W, 3)
    # Projected pixel indices are in-image and labels are train ids.
    assert (item["img_indices"][:, 0] >= 0).all()
    assert (item["img_indices"][:, 0] < H).all()
    assert (item["img_indices"][:, 1] < W).all()
    assert item["seg_label"].max() < 20
    # Inverse map devoxelizes back to all kept points.
    assert len(item["inverse_map"]) == item["sparse_orig_points_idx"].sum()
    assert item["inverse_map"].max() == k - 1

    collate = get_collate(is_train=False, batch_size=2, point_capacity=1024,
                          image_height=H, image_width=W)
    batch = collate([ds[0], ds[1]])
    assert batch["coords"].shape == (2048, 3)
    assert batch["pt_valid"][:k].all()
    assert not batch["pt_valid"][k:1024].any()
    assert batch["scan_count"][0] == k
    assert batch["num_dropped"] == 0


def test_projection_roundtrip(tmp_path, rng):
    """Points fabricated from pixels must project back to those pixels."""
    root = str(tmp_path / "kitti")
    out = str(tmp_path / "pre")
    _make_raw_kitti(root, n_frames=1, rng=rng)
    preprocess("train", root, out, W, H, num_workers=1, debug=True)
    import pickle
    with open(osp.join(out, "07", "0.pkl"), "rb") as f:
        rec = pickle.load(f)
    pts = rec["points"]
    rows = rec["points_img"][:, 0]
    cols = rec["points_img"][:, 1]
    # Re-derive pixels from geometry: u = W/2 - FX*y/x, v = H/2 - FY*z/x.
    u = W / 2 - FX * pts[:, 1] / pts[:, 0]
    v = H / 2 - FY * pts[:, 2] / pts[:, 0]
    np.testing.assert_allclose(cols, u, atol=1e-3)
    np.testing.assert_allclose(rows, v, atol=1e-3)
