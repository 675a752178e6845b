"""Capacity bucketing: collate picks the smallest sufficient bucket and the
jitted train step serves every bucket (one retrace each) with right-sized
voxel capacities (SURVEY §7 static-shape bucketing north star)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.data.collate import collate_padded
from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
from fusiontransformer_tpu.modules.steps import (TrainState, _device_batch,
                                                 level_caps_for_n,
                                                 make_train_step)


def _scan(rs, n, grid=48):
    coords = rs.randint(1, grid, size=(4 * n, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    rs.shuffle(coords)
    coords = coords[:n]
    k = len(coords)
    return {
        "coords": coords,
        "feats": rs.randn(k, 4).astype(np.float32),
        "seg_label": rs.randint(0, 20, k).astype(np.int32),
        "img": rs.rand(16, 24, 3).astype(np.float32),
        "img_indices": np.stack([rs.randint(0, 16, k),
                                 rs.randint(0, 24, k)], 1).astype(np.int32),
    }


def _cfg():
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.USE_LIDAR = True
    cfg.MODEL.NUM_CLASSES = 20
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TPU.POINT_CAPACITY = 512
    cfg.TPU.CAPACITY_BUCKETS = (128, 256, 512)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    return cfg


def test_collate_picks_smallest_bucket():
    rs = np.random.RandomState(0)
    buckets = (128, 256, 512)
    small = collate_padded([_scan(rs, 100), _scan(rs, 90)], 2, 512, 16, 24,
                           capacity_buckets=buckets)
    assert small["coords"].shape[0] == 2 * 128
    mid = collate_padded([_scan(rs, 100), _scan(rs, 200)], 2, 512, 16, 24,
                         capacity_buckets=buckets)
    assert mid["coords"].shape[0] == 2 * 256
    # larger than every bucket: use the largest and drop overflow
    big = collate_padded([_scan(rs, 600)], 1, 512, 16, 24,
                         capacity_buckets=buckets)
    assert big["coords"].shape[0] == 512
    assert big["num_dropped"] > 0


@pytest.mark.slow
def test_train_step_serves_multiple_buckets():
    cfg = _cfg()
    rs = np.random.RandomState(1)

    from fusiontransformer_tpu.models.build import build_model
    model = build_model(cfg)[0]
    tx = optax.adam(1e-3)
    state = init_train_state(cfg, model, tx, cfg.TRAIN.BATCH_SIZE)
    step = jax.jit(make_train_step(cfg, model, tx, cfg.TRAIN.BATCH_SIZE)[0])
    rng = jax.random.PRNGKey(0)

    losses = []
    for sizes in ((100, 90), (200, 240)):   # -> buckets 128 and 256
        batch = collate_padded([_scan(rs, n) for n in sizes], 2, 512, 16, 24,
                               capacity_buckets=cfg.TPU.CAPACITY_BUCKETS)
        n_total = batch["coords"].shape[0]
        caps = level_caps_for_n(cfg, n_total)
        assert caps[0] <= n_total
        state, metrics = step(state, _device_batch(batch), rng)
        loss = float(np.asarray(metrics["total_loss"]))
        assert np.isfinite(loss)
        assert int(np.asarray(metrics["voxel_overflow"])) == 0
        losses.append(loss)
    assert len(losses) == 2


@pytest.mark.slow
def test_derived_ladder_covers_fresh_draws():
    """Bucket ladders must come from measured scan-size distributions and
    hold with zero overflow on fresh draws (VERDICT r1 #6).

    Derives a ladder from 64 jittered synthetic scans, then replays a
    disjoint 640-scan sample (10x, i.e. beyond p99.8 of the fit sample's
    resolution) through the recommendation and asserts no scan overflows
    its bucket's per-level capacities.
    """
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from derive_buckets import measure, recommend, verify_zero_overflow

    from fusiontransformer_tpu.data.synthetic import SyntheticSCN

    fit_ds = SyntheticSCN(split=("train",), num_scans=64, num_points=4096,
                          point_count_jitter=0.5, seed=0)
    stats = measure(fit_ds, 64, num_levels=5)
    rec = recommend(stats, percentiles=(60, 85, 100), headroom=1.15)
    assert len(rec["buckets"]) >= 2, rec["buckets"]
    assert rec["point_capacity"] == max(rec["buckets"])
    assert verify_zero_overflow(stats, rec) == 0

    test_ds = SyntheticSCN(split=("val",), num_scans=640, num_points=4096,
                           point_count_jitter=0.5, seed=7)
    fresh = measure(test_ds, 640, num_levels=5)
    assert verify_zero_overflow(fresh, rec) == 0
