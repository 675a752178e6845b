"""Fusion models: late / middle / early (reference ``models/{late,middle,early}_fusion.py``).

All three pair a ``Net2DBilinear`` image stream with an SPVCNN lidar stream:

* late   — independent streams, coupled only through the KL loss
  (``late_fusion.py:37-59``);
* middle — ViT block-5 features lifted to points, Linear(96->256)+BN+ReLU,
  added at the UNet bottleneck z1 (``middle_fusion.py:18-22,48``);
* early  — ViT block-0 features, Linear(96->32)+BN+ReLU, added to z0 right
  after the stem (``early_fusion.py:17-21,39``).

The reference detaches image features before injection
(``middle_fusion.py:102``, ``early_fusion.py:105``) so gradients flow only
through the 3D stream; here that's ``jax.lax.stop_gradient``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fusiontransformer_tpu.models.image_models import Net2DBilinear
from fusiontransformer_tpu.models.layers import TorchLinear
from fusiontransformer_tpu.models.spvcnn import SPVCNN


class Net3DSeg(nn.Module):
    """SPVCNN + head(s), with optional fusion injection."""

    num_classes: int
    dual_head: bool
    fusion: Optional[str] = None   # None | 'early' | 'middle'
    cr: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pt_feats, hier, train: bool = False,
                 fusion_feats=None):
        feats = SPVCNN(cr=self.cr, fusion=self.fusion,
                       compute_dtype=self.compute_dtype, name="backbone")(
            pt_feats, hier, train, fusion_feats=fusion_feats)
        preds = {
            "lidar_feats": feats,
            "lidar_seg_logit": TorchLinear(self.num_classes,
                                           compute_dtype=self.compute_dtype,
                                           name="linear")(feats),
        }
        if self.dual_head:
            preds["lidar_seg_logit2"] = TorchLinear(
                self.num_classes, compute_dtype=self.compute_dtype,
                name="linear2")(feats)
        return preds


class FusionTransformerBase(nn.Module):
    num_classes: int
    dual_head: bool
    fusion: Optional[str] = None
    middle_feat_block: Optional[int] = None
    late_feat_block: int = 11
    cr: float = 1.0
    image_height: int = 370
    image_width: int = 1226
    remat_vit: bool = False
    vit_img_size: int = 384
    vit_patch: int = 16
    vit_embed_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    vit_tp: int = 1                      # tensor-parallel ranks for the ViT
    vit_tp_axis: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier, train: bool = False):
        preds_image = Net2DBilinear(
            num_classes=self.num_classes, dual_head=self.dual_head,
            middle_feat_block=self.middle_feat_block,
            late_feat_block=self.late_feat_block,
            image_height=self.image_height, image_width=self.image_width,
            remat_vit=self.remat_vit,
            vit_img_size=self.vit_img_size, vit_patch=self.vit_patch,
            vit_embed_dim=self.vit_embed_dim, vit_depth=self.vit_depth,
            vit_heads=self.vit_heads, vit_tp=self.vit_tp,
            vit_tp_axis=self.vit_tp_axis, compute_dtype=self.compute_dtype,
            name="image_backbone")(
            batch["img"], batch["img_indices"], batch["pt_batch"], train)

        fusion_feats = None
        if self.fusion in ("early", "middle"):
            fusion_feats = jax.lax.stop_gradient(
                preds_image["img_middle_feats"])

        preds_lidar = Net3DSeg(
            num_classes=self.num_classes, dual_head=self.dual_head,
            fusion=self.fusion, cr=self.cr,
            compute_dtype=self.compute_dtype, name="lidar_backbone")(
            batch["feats"], hier, train, fusion_feats=fusion_feats)

        out = {
            "lidar_seg_logit": preds_lidar["lidar_seg_logit"],
            "img_seg_logit": preds_image["img_seg_logit"],
        }
        if self.dual_head:
            out["lidar_seg_logit2"] = preds_lidar["lidar_seg_logit2"]
            out["img_seg_logit2"] = preds_image["img_seg_logit2"]
        return out


def LateFusionTransformer(**kw):
    return FusionTransformerBase(fusion=None, **kw)


def MiddleFusionTransformer(**kw):
    return FusionTransformerBase(fusion="middle", **kw)


def EarlyFusionTransformer(**kw):
    return FusionTransformerBase(fusion="early", **kw)
