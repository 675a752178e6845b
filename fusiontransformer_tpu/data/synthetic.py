"""Synthetic in-memory LiDAR+camera scans for hermetic tests and benchmarks.

Replaces the reference's on-disk ``DebugDataset`` fixture (SURVEY.md §4):
random planar surfaces inside a camera frustum, analytically projected to
pixels with a KITTI-like pinhole, labeled by surface id.  Emits exactly the
same per-item schema as the real SemanticKITTI dataset so every downstream
stage (collate, hierarchy, model, eval devoxelization) is exercised without
any dataset on disk.
"""

from __future__ import annotations

import numpy as np

from fusiontransformer_tpu.data.quantize import sparse_quantize
from fusiontransformer_tpu.data.utils.augmentation_3d import augment_and_scale_3d


class SyntheticSCN:
    """KITTI-shaped synthetic dataset."""

    def __init__(self, split=("train",), num_scans=8, num_points=4096,
                 scale=20, full_scale=4096, image_width=1226, image_height=370,
                 image_normalizer=None, seed=0, output_orig=False,
                 num_classes=20, **aug):
        self.split = split
        self.num_scans = num_scans
        self.num_points = num_points
        self.scale = scale
        self.full_scale = full_scale
        self.image_width = image_width
        self.image_height = image_height
        self.output_orig = output_orig
        self.num_classes = num_classes
        self.aug = {k: v for k, v in aug.items()
                    if k in ("noisy_rot", "flip_y", "rot_z", "transl")}
        base = {"train": 0, "val": 10_000, "test": 20_000}.get(split[0], 0)
        self.seed = seed + base
        self.class_names = [f"class_{i}" for i in range(num_classes)]
        self.class_labels = list(range(num_classes))
        self.map_inverse_label = None
        # KITTI-like intrinsics scaled to the synthetic image size.
        self.fx = 707.0 * image_width / 1226.0
        self.fy = 707.0 * image_height / 370.0
        self.cx = image_width / 2.0
        self.cy = image_height / 2.0

    def __len__(self):
        return self.num_scans

    def _make_scan(self, rng):
        n = self.num_points
        # A ground plane + a few vertical facades, all inside the frustum.
        pts, labels = [], []
        remaining = n
        n_surf = 4
        for s in range(n_surf):
            k = remaining if s == n_surf - 1 else n // n_surf
            remaining -= k
            depth = rng.uniform(5.0, 40.0, k)
            u = rng.uniform(0, self.image_width, k)
            v = rng.uniform(0, self.image_height, k)
            x = depth
            y = -(u - self.cx) * depth / self.fx
            z = -(v - self.cy) * depth / self.fy
            if s == 0:
                z = rng.uniform(-1.8, -1.6, k)          # ground
            pts.append(np.stack([x, y, z], 1))
            labels.append(np.full(k, 1 + s % (self.num_classes - 1)))
        points = np.concatenate(pts).astype(np.float32)
        seg = np.concatenate(labels).astype(np.int64)
        return points, seg

    def _project(self, points):
        """Pinhole projection to (row, col); all synthetic points x>0."""
        u = self.cx - self.fx * points[:, 1] / points[:, 0]
        v = self.cy - self.fy * points[:, 2] / points[:, 0]
        rows = np.clip(np.floor(v), 0, self.image_height - 1)
        cols = np.clip(np.floor(u), 0, self.image_width - 1)
        return np.stack([rows, cols], 1).astype(np.int64)

    def __getitem__(self, index):
        rng = np.random.RandomState(self.seed + index)
        points, seg_label = self._make_scan(rng)
        points_img = self._project(points)
        feats = np.concatenate(
            [points, rng.rand(len(points), 1).astype(np.float32)], 1)
        img = rng.rand(self.image_height, self.image_width, 3).astype(np.float32)

        coords = augment_and_scale_3d(points, self.scale, self.full_scale,
                                      rng=rng, **self.aug).astype(np.int64)
        keep = (coords.min(1) >= 0) & (coords.max(1) < self.full_scale)
        vox_coords = coords[keep]
        vox_feats = feats[keep]
        vox_seg = seg_label[keep]
        vox_img_idx = points_img[keep]

        uniq, inverse = sparse_quantize(vox_coords)
        out = {
            "coords": vox_coords[uniq].astype(np.int32),
            "feats": vox_feats[uniq].astype(np.float32),
            "seg_label": vox_seg[uniq].astype(np.int32),
            "img_indices": vox_img_idx[uniq].astype(np.int32),
            "img": img,
            "seq": "synthetic",
            "filename": f"{index:06d}",
        }
        if self.output_orig:
            out["orig_seg_label"] = seg_label
            out["sparse_orig_points_idx"] = keep
            out["inverse_map"] = inverse
        return out
