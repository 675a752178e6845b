"""ZeRO-1 optimizer-state sharding: bitwise step parity + trainer cycle.

Beyond-parity feature (the reference replicates optimizer state per DDP
rank): Adam moments live 1/n per data rank (`parallel/zero.py`), the
optimizer math is elementwise so shard updates equal full updates exactly.
"""

import glob
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.parallel import zero as zero_lib
import pytest


def _tiny_cfg(tmp_path, n_dev=4, zero=False):
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.TEST = ("test",)
    cfg.DATASET.SyntheticSCN.num_scans = n_dev
    cfg.DATASET.SyntheticSCN.num_points = 200
    cfg.DATASET.SyntheticSCN.image_width = 64
    cfg.DATASET.SyntheticSCN.image_height = 32
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.OPTIMIZER.WEIGHT_DECAY = 5e-4
    cfg.SCHEDULER.MAX_EPOCH = 1
    cfg.TRAIN.BATCH_SIZE = n_dev
    cfg.VAL.BATCH_SIZE = n_dev
    cfg.VAL.PERIOD = 1
    cfg.TEST.BATCH_SIZE = 2
    cfg.TPU.POINT_CAPACITY = 256
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NUM_DEVICES = n_dev
    cfg.TPU.ZERO_OPTIMIZER = zero
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()
    return cfg


def test_split_merge_roundtrip(tmp_path):
    import optax

    params = {"a": jnp.arange(10.0), "b": {"c": jnp.ones((3, 5))},
              "d": jnp.zeros((1, 1, 7))}
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate)))(learning_rate=1e-3)
    canonical = tx.init(params)
    for n in (2, 4, 8):
        stacked = zero_lib.split_opt_state(canonical, n)
        # array leaves are [n, chunk]; scalars untouched
        mu = stacked.inner_state[1].mu
        assert mu["a"].shape == (n, -(-10 // n))
        merged = zero_lib.merge_opt_state(stacked, canonical)
        for a, b in zip(jax.tree_util.tree_leaves(canonical),
                        jax.tree_util.tree_leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_zero_trainer_parity_and_checkpoint(tmp_path):
    """DistributedTrainer with and without ZeRO-1 produce identical params
    after an epoch; the ZeRO run's checkpoint stores the canonical layout."""
    from fusiontransformer_tpu.modules.DistributedTrainer import (
        DistributedTrainer)

    out_a = tmp_path / "dp"
    out_b = tmp_path / "zero"
    out_a.mkdir()
    out_b.mkdir()

    cfg_a = _tiny_cfg(out_a, zero=False)
    t_a = DistributedTrainer(cfg_a, str(out_a), "dp")
    t_a.train()

    cfg_b = _tiny_cfg(out_b, zero=True)
    t_b = DistributedTrainer(cfg_b, str(out_b), "zero")
    # ZeRO layout: Adam moments stacked [n, chunk]
    mu_leaves = jax.tree_util.tree_leaves(
        t_b.state.opt_state.inner_state[1].mu)
    assert all(l.ndim == 2 and l.shape[0] == 4 for l in mu_leaves)
    t_b.train()

    flat_a = jax.tree_util.tree_flatten_with_path(t_a.state.params)[0]
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(t_b.state.params)[0]}
    for path, a in flat_a:
        b = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))

    # Checkpoint holds canonical (unsharded) moments.
    saved = sorted(glob.glob(osp.join(str(out_b), "max-MeanIoU-*.ckpt")))
    assert saved
    from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2
    payload = CheckpointerV2(save_dir=str(out_b)).load(saved[-1],
                                                       resume=False)
    stem_kernel = payload["params"]["backbone"]["stem0"]["kernel"]
    mu_tree = payload["opt_state"]["inner_state"]["1"]["mu"] \
        if "inner_state" in payload["opt_state"] else None
    if mu_tree is not None:
        mu_stem = mu_tree["backbone"]["stem0"]["kernel"]
        assert np.asarray(mu_stem).shape == np.asarray(stem_kernel).shape
