"""UNet on a ResNet34 encoder (reference ``models/resnet34_unet.py``).

Legacy xMUDA 2D backbone: ResNet34 with a stride-1 7x7 stem (so the first
skip stays full-res), four encoder stages, and a 4-stage transpose-conv
decoder with concat skips; input padded to a multiple of 16 and cropped back.
NHWC + flax.linen; the torchvision-pretrained init is available through the
torch->flax converter (``utils/torch_convert.py``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fusiontransformer_tpu.models.layers import MaskedBatchNorm2d


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        cdt = self.compute_dtype
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=cdt, name="conv1")(x)
        h = MaskedBatchNorm2d(name="bn1")(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=cdt, name="conv2")(h)
        h = MaskedBatchNorm2d(name="bn2")(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=cdt, name="down_conv")(x)
            x = MaskedBatchNorm2d(name="down_bn")(x, train)
        return nn.relu(h + x.astype(h.dtype))


class _DecStage(nn.Module):
    """conv3x3+BN+ReLU after skip-concat (reference ``dec_stage``)."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), padding=1,
                    dtype=self.compute_dtype, name="conv")(x)
        x = MaskedBatchNorm2d(name="bn")(x, train)
        return nn.relu(x)


class _UpStage(nn.Module):
    """ConvTranspose(2,2)+BN+ReLU (reference ``dec_stage`` t_conv)."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             dtype=self.compute_dtype, name="tconv")(x)
        x = MaskedBatchNorm2d(name="bn")(x, train)
        return nn.relu(x)


class UNetResNet34(nn.Module):
    layer_blocks: Sequence[int] = (3, 4, 6, 3)
    dropout_rate: float = 0.4
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, H, W, 3] NHWC.
        cdt = self.compute_dtype
        h0, w0 = x.shape[1], x.shape[2]
        pad_h = (-h0) % 16
        pad_w = (-w0) % 16
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        def drop(v):
            if train and self.dropout_rate > 0:
                return nn.Dropout(self.dropout_rate, deterministic=False)(v)
            return v

        # Encoder (stride-1 stem, reference :18-19).
        x = nn.Conv(64, (7, 7), padding=3, use_bias=False, dtype=cdt,
                    name="conv1")(x)
        x = MaskedBatchNorm2d(name="bn1")(x, train)
        x = nn.relu(x)
        skips = [x]
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        plan = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for li, ((feats, stride), blocks) in enumerate(
                zip(plan, self.layer_blocks)):
            for bi in range(blocks):
                x = BasicBlock(feats, stride if bi == 0 else 1, cdt,
                               name=f"layer{li+1}_block{bi}")(x, train)
            if li in (0, 1):
                skips.append(x)
            if li == 2:
                x = drop(x)
                skips.append(x)
        x = drop(x)

        # Decoder.
        x = _UpStage(256, cdt, name="dec_t_conv_stage5")(x, train)
        x = jnp.concatenate([skips[3], x.astype(skips[3].dtype)], axis=-1)
        x = _DecStage(256, cdt, name="dec_conv_stage4")(x, train)

        x = _UpStage(128, cdt, name="dec_t_conv_stage4")(x, train)
        x = jnp.concatenate([skips[2], x.astype(skips[2].dtype)], axis=-1)
        x = _DecStage(128, cdt, name="dec_conv_stage3")(x, train)

        x = _UpStage(64, cdt, name="dec_t_conv_stage3")(x, train)
        x = jnp.concatenate([skips[1], x.astype(skips[1].dtype)], axis=-1)
        x = _DecStage(64, cdt, name="dec_conv_stage2")(x, train)

        x = _UpStage(64, cdt, name="dec_t_conv_stage2")(x, train)
        x = jnp.concatenate([skips[0], x.astype(skips[0].dtype)], axis=-1)
        x = nn.Conv(64, (3, 3), padding=1, dtype=cdt,
                    name="dec_conv_stage1")(x)

        if pad_h or pad_w:
            x = x[:, :h0, :w0]
        return x
