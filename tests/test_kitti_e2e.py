"""Full real-data path: raw KITTI tree -> offline preprocess -> config-driven
training (SemanticTrainer over SemanticKITTISCN) -> validation -> test-split
eval with per-class IoU on original points.

This is the synthetic-free seam the SyntheticSCN e2e tests cannot cover: the
exact pipeline a user runs on the real dataset (reference ``train.py`` ->
``SemanticTrainer`` -> ``data/utils/validate.py``), exercised hermetically on
a fabricated raw dataset in the real on-disk format.
"""

import numpy as np

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.data.semantic_kitti.preprocess import preprocess

from tests.test_kitti_pipeline import H, W, _make_raw_kitti
import pytest


def _cfg(tmp_path, root, out):
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.NUM_CLASSES = 20
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SemanticKITTISCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.TEST = ("test",)
    ds = cfg.DATASET.SemanticKITTISCN
    ds.preprocess_dir = out
    ds.semantic_kitti_dir = root
    ds.image_width = W
    ds.image_height = H
    ds.debug = True          # splits.debug: train=07, val=01, test=08
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.SCHEDULER.MAX_EPOCH = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.VAL.BATCH_SIZE = 2
    cfg.VAL.PERIOD = 1
    cfg.TEST.BATCH_SIZE = 1
    cfg.TPU.POINT_CAPACITY = 768
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()
    return cfg


@pytest.mark.slow
def test_raw_kitti_train_validate_test(tmp_path, rng):
    root = str(tmp_path / "kitti")
    out = str(tmp_path / "preprocessed")
    for seq in ("07", "01", "08"):
        _make_raw_kitti(root, seq=seq, n_frames=2, n_pts=400, rng=rng)
    for split in ("train", "val", "test"):
        preprocess(split, root, out, W, H, num_workers=1, debug=True)

    cfg = _cfg(tmp_path, root, out)

    from fusiontransformer_tpu.modules.SemanticTrainer import SemanticTrainer
    trainer = SemanticTrainer(cfg, str(tmp_path), "rawkitti")
    trainer.train()

    loss = trainer.train_metric_logger.meters["seg_loss_3d"].global_avg
    assert np.isfinite(loss)
    assert "seg_iou_3d" in trainer.val_metric_logger.meters
    iou = trainer.val_metric_logger.meters["seg_iou_3d"].global_avg
    assert 0.0 <= iou <= 1.0
    assert trainer.checkpointer.has_checkpoint()

    # Test-split eval through the CLI path: checkpoint -> validate() with
    # inverse-map devoxelization + inverse label map -> per-class IoU.
    import argparse
    from fusiontransformer_tpu.test import test as run_test
    test_logger = run_test(
        cfg, argparse.Namespace(ckpt=None), output_dir=str(tmp_path))
    assert "seg_iou_3d" in test_logger.meters
    test_iou = test_logger.meters["seg_iou_3d"].global_avg
    assert 0.0 <= test_iou <= 1.0
    # Capacity was sufficient: no points dropped or lost to inverse-map OOB.
    assert test_logger.meters["collate_dropped"].global_avg == 0
    assert test_logger.meters["oob_points"].global_avg == 0
