"""Numeric parity of the eval chain: per-scan slicing -> inverse-map
devoxelization -> inverse label mapping -> Evaluator (SURVEY.md hard-part 3:
off-by-ones here silently shift mIoU)."""

import numpy as np

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.data.build import build_dataloader
from fusiontransformer_tpu.data.semantic_kitti import labels as L
from fusiontransformer_tpu.data.utils.validate import validate
from fusiontransformer_tpu.utils.metric_logger import MetricLogger


class _KittiLikeSynthetic:
    """Wrap SyntheticSCN items with the KITTI label mapping applied."""


def test_oracle_predictions_give_perfect_iou(tmp_path):
    """Feed ground-truth labels as 'predictions': overall IoU must be 1.0
    and ignored (class 0) points must not contribute."""
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TEST = ("test",)
    cfg.DATASET.SyntheticSCN.num_scans = 4
    cfg.DATASET.SyntheticSCN.num_points = 300
    cfg.DATASET.SyntheticSCN.image_width = 64
    cfg.DATASET.SyntheticSCN.image_height = 32
    cfg.TEST.BATCH_SIZE = 2
    cfg.TPU.POINT_CAPACITY = 512
    cfg.freeze()

    loader = build_dataloader(cfg, mode="test")
    # Use the KITTI inverse label map so that path is exercised too.
    loader.dataset.map_inverse_label = L.make_inverse_label_mapper()
    loader.dataset.class_labels = L.class_labels()
    loader.dataset.class_names = L.class_names()

    def oracle_eval_step(state, batch):
        # Per-UNIQUE-VOXEL prediction = the voxel's label: after inverse-map
        # devoxelization every original point recovers its own label only if
        # the full chain (slice -> inverse map -> label map) is exact.
        return {"pred_3d": batch["seg_label"],
                "seg_loss_3d": np.float32(0.0)}

    ml = MetricLogger()
    evals = validate(cfg, oracle_eval_step, state=None, dataloader=loader,
                     val_metric_logger=ml)
    (_, evaluator), = [e for e in evals if e[0] == "3D"]
    # Voxelization merges points with different labels into one voxel, so a
    # handful of points may disagree with their voxel's representative label;
    # accuracy must still be ~1 and mean IoU near-perfect.
    assert evaluator.overall_acc > 0.98
    # Absent classes score 0 in the reference's overall_iou (NaN -> 0), so
    # check per-class: every class that appears must be ~perfect.
    per_class = np.array(evaluator.class_iou, np.float64)
    present = ~np.isnan(per_class)
    assert present.sum() >= 5
    assert (per_class[present] > 0.95).all(), per_class[present]

    def wrong_eval_step(state, batch):
        return {"pred_3d": (batch["seg_label"] + 1) % 20,
                "seg_loss_3d": np.float32(0.0)}

    ml2 = MetricLogger()
    evals2 = validate(cfg, wrong_eval_step, state=None, dataloader=loader,
                      val_metric_logger=ml2)
    (_, ev2), = [e for e in evals2 if e[0] == "3D"]
    assert ev2.overall_acc < 0.05


def test_map_sparse_to_org_truncated_scan():
    """Capacity-dropped voxels devoxelize to class 0 (ignore) — not a crash.

    Covers the static-capacity edge the reference cannot hit (its shapes are
    dynamic): a scan with more unique voxels than POINT_CAPACITY keeps its
    first `cap` voxels; original points of dropped voxels must come back as
    the ignore id so they count as errors in the IoU table.
    """
    import numpy as np

    from fusiontransformer_tpu.data.utils.validate import map_sparse_to_org

    preds = np.array([5, 6, 7], np.int32)          # 3 kept voxels
    inverse_map = np.array([0, 1, 2, 2, 3, 4], np.int64)  # 5 uniques, 2 dropped
    out, n_oob = map_sparse_to_org(preds, inverse_map)
    np.testing.assert_array_equal(out, [5, 6, 7, 7, 0, 0])
    assert n_oob == 2
    # No-drop fast path unchanged.
    out, n_oob = map_sparse_to_org(preds, np.array([2, 0, 1, 1], np.int64))
    np.testing.assert_array_equal(out, [7, 5, 6, 6])
    assert n_oob == 0
