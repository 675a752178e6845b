"""Model factory (reference ``models/build.py:15-89``).

Dispatches on MODEL.USE_FUSION / USE_LIDAR / USE_IMAGE x MODEL.TYPE and
returns ``(flax_module, metric[, metric])`` with the same tuple arity as the
reference so trainer code unpacks identically.
"""

from __future__ import annotations

import jax.numpy as jnp

from fusiontransformer_tpu.models.fusion import (EarlyFusionTransformer,
                                                 FusionTransformerBase,
                                                 LateFusionTransformer,
                                                 MiddleFusionTransformer)
from fusiontransformer_tpu.models.image_models import ImageSegBilinear
from fusiontransformer_tpu.models.lidar_model import LidarSeg
from fusiontransformer_tpu.models.metric import SegIoU


def _compute_dtype(cfg):
    name = cfg.TPU.COMPUTE_DTYPE if "TPU" in cfg else "bfloat16"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _image_dims(cfg):
    ds = cfg.DATASET.get(cfg.DATASET.TYPE, {})
    return (ds.get("image_height", 370), ds.get("image_width", 1226))


def build_metrics(cfg):
    train_3d = SegIoU(num_classes=cfg.MODEL.NUM_CLASSES, name="seg_iou_3d")
    train_2d = SegIoU(num_classes=cfg.MODEL.NUM_CLASSES, name="seg_iou_2d")
    return train_2d, train_3d


def build_model(cfg, vit_tp=1, vit_tp_axis=None):
    """``vit_tp > 1`` builds the ViT stream tensor-parallel (Megatron head/
    hidden sharding over the named ``vit_tp_axis`` mesh axis; see
    ``parallel/tensor_parallel.py``).  Init/eval/checkpoint always use the
    canonical tp=1 model — only the sharded train step needs a TP build."""
    cdt = _compute_dtype(cfg)
    h, w = _image_dims(cfg)
    remat = bool(cfg.TPU.REMAT_VIT) if "TPU" in cfg else False
    vit_kwargs = dict(
        vit_img_size=cfg.MODEL.get("VIT_IMG_SIZE", 384),
        vit_patch=cfg.MODEL.get("VIT_PATCH", 16),
        vit_embed_dim=cfg.MODEL.get("VIT_EMBED_DIM", 768),
        vit_depth=cfg.MODEL.get("VIT_DEPTH", 12),
        vit_heads=cfg.MODEL.get("VIT_HEADS", 12),
        vit_tp=vit_tp, vit_tp_axis=vit_tp_axis,
    )
    fusion_kwargs = dict(
        num_classes=cfg.MODEL.NUM_CLASSES,
        dual_head=cfg.MODEL.DUAL_HEAD,
        middle_feat_block=cfg.MODEL.middle_feat_block_number,
        late_feat_block=cfg.MODEL.late_feat_block_number
        if cfg.MODEL.late_feat_block_number is not None else 11,
        image_height=h, image_width=w,
        remat_vit=remat, compute_dtype=cdt,
        **vit_kwargs,
    )
    if vit_tp > 1:
        assert cfg.MODEL.TYPE in ("LateFusionTransformer",
                                  "MiddleFusionTransformer",
                                  "EarlyFusionTransformer",
                                  "ImageSegBilinear"), (
            f"tensor parallelism requires a ViT-stream model, "
            f"got {cfg.MODEL.TYPE}")

    if cfg.MODEL.USE_FUSION:
        train_2d, train_3d = build_metrics(cfg)
        if cfg.MODEL.TYPE == "XMUDAFusion":
            from fusiontransformer_tpu.models.xmuda_arch import XMUDAFusion
            model = XMUDAFusion(num_classes=cfg.MODEL.NUM_CLASSES,
                                dual_head=cfg.MODEL.DUAL_HEAD,
                                compute_dtype=cdt)
            return model, train_2d, train_3d
        builders = {
            "LateFusionTransformer": LateFusionTransformer,
            "MiddleFusionTransformer": MiddleFusionTransformer,
            "EarlyFusionTransformer": EarlyFusionTransformer,
        }
        model = builders[cfg.MODEL.TYPE](**fusion_kwargs)
        return model, train_2d, train_3d

    if cfg.MODEL.USE_LIDAR:
        assert cfg.MODEL.TYPE in ("LidarSeg", "LidarSegSCN"), cfg.MODEL.TYPE
        if cfg.MODEL.TYPE == "LidarSegSCN":
            from fusiontransformer_tpu.models.xmuda_arch import LidarSegSCN
            model = LidarSegSCN(num_classes=cfg.MODEL.NUM_CLASSES,
                                dual_head=cfg.MODEL.DUAL_HEAD,
                                compute_dtype=cdt)
        else:
            model = LidarSeg(num_classes=cfg.MODEL.NUM_CLASSES,
                             compute_dtype=cdt)
        return model, SegIoU(num_classes=cfg.MODEL.NUM_CLASSES,
                             name="seg_iou_3d")

    if cfg.MODEL.USE_IMAGE:
        assert cfg.MODEL.TYPE in ("ImageSegBilinear", "ImageSeg",
                                  "ImageSegResNet"), cfg.MODEL.TYPE
        if cfg.MODEL.TYPE == "ImageSegResNet":
            from fusiontransformer_tpu.models.xmuda_arch import ImageSegResNet
            model = ImageSegResNet(num_classes=cfg.MODEL.NUM_CLASSES,
                                   dual_head=cfg.MODEL.DUAL_HEAD,
                                   compute_dtype=cdt)
            return model, SegIoU(num_classes=cfg.MODEL.NUM_CLASSES,
                                 name="seg_iou_2d")
        # The STN 'ImageSeg' variant shares the bilinear path; the reference's
        # STN network (image_models_stn.py) is retained as a legacy variant —
        # see models/image_models_stn.py.
        if cfg.MODEL.TYPE == "ImageSeg":
            from fusiontransformer_tpu.models.image_models_stn import ImageSegSTN
            model = ImageSegSTN(num_classes=cfg.MODEL.NUM_CLASSES,
                                dual_head=cfg.MODEL.DUAL_HEAD,
                                image_height=h, image_width=w,
                                compute_dtype=cdt)
        else:
            model = ImageSegBilinear(
                num_classes=cfg.MODEL.NUM_CLASSES,
                dual_head=cfg.MODEL.DUAL_HEAD,
                middle_feat_block=cfg.MODEL.middle_feat_block_number,
                late_feat_block=cfg.MODEL.late_feat_block_number
                if cfg.MODEL.late_feat_block_number is not None else 11,
                image_height=h, image_width=w,
                remat_vit=remat, compute_dtype=cdt,
                **vit_kwargs)
        return model, SegIoU(num_classes=cfg.MODEL.NUM_CLASSES,
                             name="seg_iou_2d")

    raise ValueError(f"Unsupported model config: {cfg.MODEL.TYPE}")


def maybe_load_pretrained_image(cfg, params):
    """Load IMAGE_PRETRAINED_PATH (SimCLR 'backbone.'-prefixed torch ckpt,
    reference image_models_billinear.py:42-53) into the ViT params in place.

    Returns the number of replaced leaves (0 when no path configured).
    """
    path = cfg.MODEL.IMAGE_PRETRAINED_PATH
    if not path:
        return 0
    from fusiontransformer_tpu.utils.torch_convert import (load_pretrained_vit,
                                                           merge_params)
    converted = load_pretrained_vit(path, strip_prefix="backbone.")
    target = params
    for key in ("image_backbone", "backbone"):
        if key in target:
            target = target[key]
    return merge_params(target, converted)
