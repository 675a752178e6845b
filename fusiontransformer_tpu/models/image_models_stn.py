"""Legacy STN image variant (reference ``models/image_models_stn.py`` +
``models/transformers.py:102-156``).

``SpatialTransformer`` regresses a 2x3 affine from a small localization CNN
and resamples via affine_grid/grid_sample; ``ScaleUpModule`` is a 16x16
stride-16 transposed conv (a per-token linear on TPU) followed by an STN to
the target (370, 1226) shape.  The bilinear variant in ``image_models.py`` is
the one the active configs use; this exists for full component parity
('ImageSeg' / 'image.yaml').
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from fusiontransformer_tpu.models.layers import TorchLinear
from fusiontransformer_tpu.models.vit import VisionTransformer2D
from fusiontransformer_tpu.ops.image_warp import affine_grid, grid_sample_bilinear


class SpatialTransformer(nn.Module):
    """Localization net + affine regressor + resample (transformers.py:102-135)."""

    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, out_h: int, out_w: int, out_c: int):
        # x: [B, H, W, C]
        h = nn.Conv(8, (7, 7), padding="VALID", name="loc_conv1")(x)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(h)
        h = nn.Conv(90, (5, 5), padding="VALID", name="loc_conv2")(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))                   # AdaptiveAvgPool2d(1)
        h = TorchLinear(32, name="fc1")(h)
        h = nn.relu(h)
        # Identity-initialized affine regressor (transformers.py:123-124).
        w = self.param("fc2_kernel", nn.initializers.zeros, (32, 6))
        b = self.param("fc2_bias",
                       lambda k, s: jnp.array([1, 0, 0, 0, 1, 0], jnp.float32),
                       (6,))
        theta = (h @ w + b).reshape(-1, 2, 3)
        grid = affine_grid(theta, out_h, out_w)
        y = grid_sample_bilinear(x, grid)
        # Channel adaptation: the reference relies on grid_sample keeping the
        # input channel count; out_c must equal x's channels.
        assert y.shape[-1] == out_c or out_c is None
        return y


class ScaleUpModule(nn.Module):
    """ConvTranspose2d(16x16, s16) + STN to target shape (transformers.py:137-156)."""

    out_features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, out_h: int, out_w: int):
        # tokens: [B, g*g, D] -> per-token linear to out_features*16*16.
        b, t, _ = tokens.shape
        g = int(round(t ** 0.5))
        assert g * g == t, f"token count {t} is not a square grid"
        h = TorchLinear(self.out_features * 16 * 16,
                        compute_dtype=self.compute_dtype, name="up_conv")(tokens)
        h = h.reshape(b, g, g, 16, 16, self.out_features)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * 16, g * 16,
                                                  self.out_features)
        return SpatialTransformer(name="up_stn")(h, out_h, out_w,
                                                 self.out_features)


class Net2DSegSTN(nn.Module):
    num_classes: int
    dual_head: bool
    middle_feat_block: Optional[int] = None
    late_feat_block: int = 11
    image_height: int = 370
    image_width: int = 1226
    compute_dtype: jnp.dtype = jnp.bfloat16

    def _lift(self, fmap, img_indices, pt_batch):
        # fmap: [B, H, W, C] at full camera resolution.
        b = fmap.shape[0]
        r = jnp.clip(img_indices[:, 0], 0, fmap.shape[1] - 1)
        c = jnp.clip(img_indices[:, 1], 0, fmap.shape[2] - 1)
        return fmap[jnp.clip(pt_batch, 0, b - 1), r, c]

    @nn.compact
    def __call__(self, img, img_indices, pt_batch, train: bool = False):
        x = SpatialTransformer(name="stn_down")(img, 384, 384, 3)
        taps = VisionTransformer2D(compute_dtype=self.compute_dtype,
                                   name="backbone")(x)
        late = ScaleUpModule(96, compute_dtype=self.compute_dtype,
                             name=f"up_{self.late_feat_block}")(
            taps[str(self.late_feat_block)], self.image_height,
            self.image_width)
        late_feats = self._lift(late, img_indices, pt_batch)
        preds = {
            "img_feats": late_feats,
            "img_seg_logit": TorchLinear(self.num_classes, name="linear")(
                late_feats),
        }
        if self.dual_head:
            preds["img_seg_logit2"] = TorchLinear(
                self.num_classes, name="linear2")(late_feats)
        if self.middle_feat_block is not None:
            mid = ScaleUpModule(96, compute_dtype=self.compute_dtype,
                                name=f"up_{self.middle_feat_block}")(
                taps[str(self.middle_feat_block)], self.image_height,
                self.image_width)
            preds["img_middle_feats"] = self._lift(mid, img_indices, pt_batch)
        return preds


class ImageSegSTN(nn.Module):
    """'ImageSeg' wrapper (reference ``models/image_models.py:8-21``)."""

    num_classes: int
    dual_head: bool
    image_height: int = 370
    image_width: int = 1226
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier=None, train: bool = False):
        preds = Net2DSegSTN(
            num_classes=self.num_classes, dual_head=self.dual_head,
            image_height=self.image_height, image_width=self.image_width,
            compute_dtype=self.compute_dtype, name="image_backbone")(
            batch["img"], batch["img_indices"], batch["pt_batch"], train)
        return {"img_seg_logit": preds["img_seg_logit"]}
