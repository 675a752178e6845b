"""Data-parallel (shard_map) correctness on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.models.lidar_model import LidarSeg
from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
from fusiontransformer_tpu.modules.steps import (make_eval_step,
                                                 make_train_step)
from fusiontransformer_tpu.parallel.data_parallel import (make_mesh,
                                                          replicate,
                                                          shard_batch,
                                                          shard_eval_step,
                                                          shard_train_step)
from fusiontransformer_tpu.solver.build import build_optimizer
import pytest

N_DEV = 8
CAP = 128  # points per scan


def _cfg():
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.TRAIN.BATCH_SIZE = N_DEV
    cfg.TPU.POINT_CAPACITY = CAP
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    return cfg


def _batch(rng):
    n = N_DEV * CAP
    coords = np.zeros((n, 3), np.int32)
    pt_batch = np.zeros((n,), np.int32)
    valid = np.zeros((n,), bool)
    feats = np.zeros((n, 4), np.float32)
    labels = np.zeros((n,), np.int32)
    for b in range(N_DEV):
        pts = np.unique(rng.randint(0, 40, size=(80, 3)), axis=0)[:CAP]
        k = len(pts)
        lo = b * CAP
        coords[lo:lo + k] = pts
        pt_batch[lo:lo + k] = b
        valid[lo:lo + k] = True
        feats[lo:lo + k] = rng.randn(k, 4)
        labels[lo:lo + k] = rng.randint(1, 20, k)
    return {"coords": coords, "feats": feats, "seg_label": labels,
            "pt_batch": pt_batch, "pt_valid": valid}


@pytest.mark.slow
def test_sharded_eval_matches_single_device(rng):
    cfg = _cfg()
    model = LidarSeg(num_classes=20, compute_dtype=jnp.float32)
    tx, _ = build_optimizer(cfg, 1)
    state = init_train_state(cfg, model, tx, 1, rng_seed=0)
    batch = _batch(rng)

    # Single device, whole batch.
    eval_all, _ = make_eval_step(cfg, model, N_DEV)
    res_single = jax.jit(eval_all)(state, batch)

    # 8-device shard_map, one scan per device.
    mesh = make_mesh(N_DEV)
    eval_one, _ = make_eval_step(cfg, model, 1)
    eval_sharded = shard_eval_step(eval_one, mesh, scans_per_device=1)
    res_shard = eval_sharded(replicate(state, mesh),
                             shard_batch(batch, mesh))

    valid = batch["pt_valid"]
    np.testing.assert_array_equal(
        np.asarray(res_single["pred_3d"])[valid],
        np.asarray(res_shard["pred_3d"])[valid])


@pytest.mark.slow
def test_sharded_train_step_replicated_update(rng):
    cfg = _cfg()
    model = LidarSeg(num_classes=20, compute_dtype=jnp.float32)
    tx, _ = build_optimizer(cfg, 1)
    state = init_train_state(cfg, model, tx, 1, rng_seed=0)
    batch = _batch(rng)

    mesh = make_mesh(N_DEV)
    step_fn, _ = make_train_step(cfg, model, tx, 1, axis_name="data")
    train_step = shard_train_step(step_fn, mesh, scans_per_device=1)

    # Snapshot before the step: the sharded step donates its input state.
    old = np.array(state.params["backbone"]["stem0"]["kernel"])
    new_state, metrics = train_step(replicate(state, mesh),
                                    shard_batch(batch, mesh),
                                    jax.random.PRNGKey(0))
    loss = float(np.asarray(metrics["total_loss"]))
    assert np.isfinite(loss) and loss > 0
    assert int(np.asarray(metrics["voxel_overflow"])) == 0
    # Confusion matrix psum covers every valid point exactly once.
    cm = np.asarray(metrics["cm_3d"])
    assert cm.sum() == batch["pt_valid"].sum()
    # Params changed and are still replicated (single logical value).
    new = np.asarray(new_state.params["backbone"]["stem0"]["kernel"])
    assert np.abs(new - old).max() > 0
