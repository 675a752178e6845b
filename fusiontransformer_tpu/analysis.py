"""Offline analysis of dumped predictions (reference ``notebooks/``).

The reference's evaluate/visual_analysis/dataset_stats notebooks recompute
IoU and per-class statistics from the per-scan ``.npy`` dumps written by
``SavePredictions`` (``modules/TorchpackCallbacks.py:339-388``).  This CLI
does the same against the ``.npz`` dumps written by
``DistributedTrainer.test()``:

    python -m fusiontransformer_tpu.analysis --pred_dir <run>/predictions
    python -m fusiontransformer_tpu.analysis --pred_dir ... --per_scan
    python -m fusiontransformer_tpu.analysis --stats <preprocess_dir>

``--stats`` reproduces dataset_stats.ipynb: per-class point histograms and
log-smoothed class weights over a preprocessed SemanticKITTI directory
(matching ``compute_class_weights``, reference dataloader ``:256-276``).
"""

from __future__ import annotations

import argparse
import glob
import os.path as osp
import pickle

import numpy as np

from fusiontransformer_tpu.data.semantic_kitti import labels as L
from fusiontransformer_tpu.data.utils.evaluate import Evaluator


def analyze_predictions(pred_dir, num_classes=20, modality="3d",
                        per_scan=False):
    files = sorted(glob.glob(osp.join(pred_dir, "*.npz")))
    if not files:
        raise FileNotFoundError(f"no .npz prediction dumps in {pred_dir}")
    key = f"predictions_{modality}"
    evaluator = Evaluator(L.class_names(), labels=list(range(num_classes)))
    rows = []
    for f in files:
        d = np.load(f)
        if key not in d:
            continue
        pred, tgt = d[key], d["targets"]
        evaluator.update(pred, tgt.copy())
        if per_scan:
            scan_eval = Evaluator(L.class_names(),
                                  labels=list(range(num_classes)))
            scan_eval.update(pred, tgt.copy())
            rows.append((osp.basename(f), scan_eval.overall_iou))
    print(f"{len(files)} scans, modality {modality}")
    print(f"overall acc  = {100 * evaluator.overall_acc:.2f}%")
    print(f"overall mIoU = {100 * evaluator.overall_iou:.2f}")
    print(evaluator.print_table())
    if per_scan:
        rows.sort(key=lambda r: r[1])
        print("\nWorst 10 scans by IoU:")
        for name, iou in rows[:10]:
            print(f"  {name}: {100 * iou:.2f}")
    return evaluator


def overlay_predictions(pred_dir, out_dir, modality="3d", limit=20,
                        palette="SemanticKITTI_short"):
    """Visual analysis (reference ``notebooks/visual_analysis.ipynb``):
    per-scan PNGs of predicted + ground-truth labels scattered on the camera
    image, plus a BEV scatter of the voxel coords, from the ``.npz`` dumps.
    """
    import os

    from fusiontransformer_tpu.data.utils.visualize import (
        draw_bird_eye_view, draw_points_image_labels)

    files = sorted(glob.glob(osp.join(pred_dir, "*.npz")))[:limit]
    if not files:
        raise FileNotFoundError(f"no .npz prediction dumps in {pred_dir}")
    os.makedirs(out_dir, exist_ok=True)
    key = f"predictions_{modality}"
    written = []
    for f in files:
        d = np.load(f)
        stem = osp.splitext(osp.basename(f))[0]
        if key in d and "img_indices" in d and "img" in d:
            img = d["img"].astype(np.float32)
            # Images are stored normalized; min-max rescale for display.
            img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
            for tag, labels in ((f"pred_{modality}", d[key]),
                                ("gt", d["targets"])):
                path = osp.join(out_dir, f"{stem}_{tag}.png")
                draw_points_image_labels(
                    img, d["img_indices"], labels, show=False,
                    color_palette_type=palette, point_size=2.0,
                    save_path=path)
                written.append(path)
        if "coords" in d:
            path = osp.join(out_dir, f"{stem}_bev.png")
            draw_bird_eye_view(d["coords"], show=False, save_path=path)
            written.append(path)
    print(f"wrote {len(written)} overlay images to {out_dir}")
    return written


def dataset_stats(preprocess_dir, num_classes=20):
    """Per-class counts + log-smoothed class weights over the train split."""
    mapper = L.make_label_mapper()
    counts = np.zeros(num_classes, np.int64)
    files = sorted(glob.glob(osp.join(preprocess_dir, "*", "*.pkl")))
    for i, path in enumerate(files):
        with open(path, "rb") as f:
            rec = pickle.load(f)
        counts += np.bincount(mapper(rec["seg_labels"].astype(np.int64)),
                              minlength=num_classes)
        if i % 500 == 0:
            print(f"{i}/{len(files)}")
    print("points per class:", counts)
    pos = counts[1:]  # ignore class 0
    weights = np.log(5 * pos.sum() / np.maximum(pos, 1))
    print("log smoothed class weights:", weights / weights.min())
    return counts, weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", default="")
    ap.add_argument("--modality", default="3d", choices=["2d", "3d"])
    ap.add_argument("--per_scan", action="store_true")
    ap.add_argument("--stats", default="",
                    help="preprocessed dataset dir for class statistics")
    ap.add_argument("--overlay", default="",
                    help="write label-overlay + BEV PNGs to this directory")
    ap.add_argument("--palette", default="SemanticKITTI_short")
    args = ap.parse_args()
    if args.pred_dir and args.overlay:
        overlay_predictions(args.pred_dir, args.overlay,
                            modality=args.modality, palette=args.palette)
    elif args.pred_dir:
        analyze_predictions(args.pred_dir, modality=args.modality,
                            per_scan=args.per_scan)
    if args.stats:
        dataset_stats(args.stats)


if __name__ == "__main__":
    main()
