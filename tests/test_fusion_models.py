"""Fusion model smoke tests with a tiny ViT (CPU-sized)."""

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.models.fusion import FusionTransformerBase
from fusiontransformer_tpu.models.losses import (kl_divergence,
                                                 weighted_cross_entropy)
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
import pytest

CAPS = (128, 128, 96, 64, 48)
H, W = 40, 60


def _batch(rng, cap=128, n_scans=2):
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    feats = np.zeros((cap, 4), np.float32)
    img_idx = np.zeros((cap, 2), np.int32)
    pos = 0
    for b in range(n_scans):
        pts = np.unique(rng.randint(0, 30, size=(55, 3)), axis=0)
        k = min(len(pts), cap - pos)
        coords[pos:pos + k] = pts[:k]
        batch[pos:pos + k] = b
        valid[pos:pos + k] = True
        feats[pos:pos + k] = rng.randn(k, 4)
        img_idx[pos:pos + k, 0] = rng.randint(0, H, k)
        img_idx[pos:pos + k, 1] = rng.randint(0, W, k)
        pos += k
    img = rng.randn(n_scans, H, W, 3).astype(np.float32)
    label = rng.randint(1, 20, size=(cap,)).astype(np.int32)
    return dict(feats=feats, img=img, img_indices=img_idx,
                pt_batch=batch, label=label), coords, batch, valid


def _model(fusion):
    return FusionTransformerBase(
        num_classes=20, dual_head=True, fusion=fusion,
        middle_feat_block=0, late_feat_block=1,
        image_height=H, image_width=W,
        vit_img_size=32, vit_patch=16, vit_embed_dim=64, vit_depth=2,
        vit_heads=2, compute_dtype=jnp.float32)


@pytest.mark.slow
def test_middle_fusion_forward_and_xm_loss(rng):
    data, coords, batch, valid = _batch(rng)
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS)
    model = _model("middle")
    variables = model.init(jax.random.PRNGKey(0), data, hier, train=False)
    out = model.apply(variables, data, hier, train=False)
    for k in ("lidar_seg_logit", "img_seg_logit", "lidar_seg_logit2",
              "img_seg_logit2"):
        assert out[k].shape == (128, 20), k

    v = jnp.asarray(valid)
    lbl = jnp.asarray(data["label"])
    loss3d = weighted_cross_entropy(out["lidar_seg_logit"], lbl, v)
    loss2d = weighted_cross_entropy(out["img_seg_logit"], lbl, v)
    xm2 = kl_divergence(out["img_seg_logit2"], out["lidar_seg_logit"], v)
    xm3 = kl_divergence(out["lidar_seg_logit2"], out["img_seg_logit"], v)
    for val in (loss3d, loss2d, xm2, xm3):
        assert np.isfinite(float(val))


@pytest.mark.slow
def test_fusion_stop_gradient(rng):
    """Lidar CE must produce zero grads on the ViT (image feats detached,
    reference middle_fusion.py:102)."""
    data, coords, batch, valid = _batch(rng)
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS)
    model = _model("middle")
    variables = model.init(jax.random.PRNGKey(0), data, hier, train=False)

    def lidar_loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, hier, train=False)
        return weighted_cross_entropy(out["lidar_seg_logit"],
                                      jnp.asarray(data["label"]),
                                      jnp.asarray(valid))

    grads = jax.jit(jax.grad(lidar_loss))(variables["params"])
    img_grads = grads["image_backbone"]["backbone"]
    leaf_max = max(float(jnp.abs(g).max())
                   for g in jax.tree_util.tree_leaves(img_grads))
    assert leaf_max == 0.0
    lidar_leaf_max = max(float(jnp.abs(g).max())
                         for g in jax.tree_util.tree_leaves(
                             grads["lidar_backbone"]))
    assert lidar_leaf_max > 0.0


def test_early_fusion_forward(rng):
    data, coords, batch, valid = _batch(rng)
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS)
    model = _model("early")
    variables = model.init(jax.random.PRNGKey(0), data, hier, train=False)
    out = model.apply(variables, data, hier, train=False)
    assert np.isfinite(np.asarray(out["lidar_seg_logit"])[valid]).all()
