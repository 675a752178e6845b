"""Legacy xMUDA architecture (reference ``models/xmuda_arch.py``).

Retained-from-fork baseline models: a UNetResNet34 2D stream with full-res
pixel lifting, and a UNetSCN 3D stream, each with (optionally dual)
segmentation heads.  Referenced only by the legacy configs in the reference
repo (``configs/semantic_kitti/baseline.yaml``, ``xmuda*.yaml``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fusiontransformer_tpu.models.layers import TorchLinear
from fusiontransformer_tpu.models.resnet34_unet import UNetResNet34
from fusiontransformer_tpu.models.scn_unet import UNetSCN


class Net2DSeg(nn.Module):
    num_classes: int
    dual_head: bool
    backbone_2d: str = "UNetResNet34"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier=None, train: bool = False):
        assert self.backbone_2d == "UNetResNet34", self.backbone_2d
        img = batch["img"]                   # [B, H, W, 3]
        fmap = UNetResNet34(compute_dtype=self.compute_dtype,
                            name="net_2d")(img, train)   # [B, H, W, 64]
        b = fmap.shape[0]
        idx = batch["img_indices"]
        r = jnp.clip(idx[:, 0], 0, fmap.shape[1] - 1)
        c = jnp.clip(idx[:, 1], 0, fmap.shape[2] - 1)
        feats = fmap[jnp.clip(batch["pt_batch"], 0, b - 1), r, c]
        preds = {
            "feats": feats,
            "seg_logit": TorchLinear(self.num_classes, name="linear")(feats),
        }
        if self.dual_head:
            preds["seg_logit2"] = TorchLinear(self.num_classes,
                                              name="linear2")(feats)
        return preds


class LidarSegSCN(nn.Module):
    """UNetSCN stream with the standard trainer interface (CLI-reachable
    via ``configs/semantic_kitti/legacy_scn_lidar.yaml``; reference intent
    ``configs/semantic_kitti/baseline.yaml`` 3D stream).

    Needs a 7-level hierarchy: set ``TPU.LEVEL_CAPACITY_FRACTIONS`` to six
    entries in the config.
    """

    num_classes: int
    dual_head: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier, train: bool = False):
        preds = Net3DSeg(num_classes=self.num_classes,
                         dual_head=self.dual_head,
                         compute_dtype=self.compute_dtype,
                         name="net_3d_seg")(batch, hier, train)
        out = {"lidar_seg_logit": preds["seg_logit"]}
        if self.dual_head:
            out["lidar_seg_logit2"] = preds["seg_logit2"]
        return out


class ImageSegResNet(nn.Module):
    """UNetResNet34 stream with the standard trainer interface
    (``legacy_resnet_image.yaml``; reference baseline 2D stream)."""

    num_classes: int
    dual_head: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier=None, train: bool = False):
        preds = Net2DSeg(num_classes=self.num_classes,
                         dual_head=self.dual_head,
                         compute_dtype=self.compute_dtype,
                         name="net_2d_seg")(batch, hier, train)
        out = {"img_seg_logit": preds["seg_logit"]}
        if self.dual_head:
            out["img_seg_logit2"] = preds["seg_logit2"]
        return out


class XMUDAFusion(nn.Module):
    """Joint 2D+3D legacy pair (``legacy_xmuda.yaml``): UNetResNet34 +
    UNetSCN trained together, coupled only through the dual-head KL loss —
    the xMUDA recipe the reference's stale ``xmuda*.yaml`` configs encoded.
    """

    num_classes: int
    dual_head: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier, train: bool = False):
        out = ImageSegResNet(num_classes=self.num_classes,
                             dual_head=self.dual_head,
                             compute_dtype=self.compute_dtype,
                             name="image_backbone")(batch, hier, train)
        out.update(LidarSegSCN(num_classes=self.num_classes,
                               dual_head=self.dual_head,
                               compute_dtype=self.compute_dtype,
                               name="lidar_backbone")(batch, hier, train))
        return out


class Net3DSeg(nn.Module):
    num_classes: int
    dual_head: bool
    backbone_3d: str = "SCN"
    in_channels: int = 4
    m: int = 16
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier, train: bool = False):
        assert self.backbone_3d == "SCN", self.backbone_3d
        feats = UNetSCN(in_channels=self.in_channels, m=self.m,
                        compute_dtype=self.compute_dtype, name="net_3d")(
            batch["feats"], hier, train)
        preds = {
            "feats": feats,
            "seg_logit": TorchLinear(self.num_classes, name="linear")(feats),
        }
        if self.dual_head:
            preds["seg_logit2"] = TorchLinear(self.num_classes,
                                              name="linear2")(feats)
        return preds
