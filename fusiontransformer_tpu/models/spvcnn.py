"""SPVCNN — sparse point-voxel UNet, TPU-native.

Functional re-design of the reference SPVCNN backbone (reference
``models/spvcnn.py:82-233``) and its fusion variants
(``models/early_fusion.py:32-74``, ``models/middle_fusion.py:32-74``):

* channel plan ``cs = [32,32,64,128,256,256,128,96,96] * cr``
  (``models/spvcnn.py:87``);
* stem 2x ks3 convs at level 0, four (ks2-stride2 + 2 residual) down stages,
  four (transposed ks2 + skip-concat + 2 residual) up stages;
* three point-transform MLPs with additive point-stream skips
  (``models/spvcnn.py:164-180,206-231``);
* dropout 0.3 on the first features of the two decoder halves
  (``models/spvcnn.py:183,210,222``);
* optional early/middle fusion injection of image features into the point
  stream (Linear+BN+ReLU transform, image grads stopped — the reference
  ``.detach()`` at ``middle_fusion.py:102`` / ``early_fusion.py:105`` is a
  ``jax.lax.stop_gradient`` applied by the fusion wrapper).

Instead of torchsparse SparseTensor/PointTensor bookkeeping, the forward
consumes a precomputed :class:`~fusiontransformer_tpu.ops.hierarchy.Hierarchy`
(all coordinate sets + kernel maps for the batch), so the whole network is a
chain of gather-GEMM-scatter ops on fixed-capacity buffers — every GEMM lands
on the MXU with static shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fusiontransformer_tpu.models.layers import (MaskedBatchNorm, TorchLinear,
                                                 torch_uniform_init)
from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import Hierarchy


class SubMConv3(nn.Module):
    """ks=3 stride=1 sparse conv (no bias, torchsparse parity)."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, nbr_idx, slot_idx=None):
        cin = x.shape[-1]
        w = self.param("kernel", torch_uniform_init(cin * 27),
                       (27, cin, self.features))
        return sc.subm_conv3(x, w, nbr_idx, self.compute_dtype,
                             slot_idx=slot_idx)


class DownConv2(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, child_idx, parent_idx=None, child_kidx=None):
        cin = x.shape[-1]
        w = self.param("kernel", torch_uniform_init(cin * 8),
                       (8, cin, self.features))
        return sc.down_conv2(x, w, child_idx, parent_idx, child_kidx,
                             self.compute_dtype)


class UpConv2(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, parent_idx, child_kidx, child_idx=None):
        cin = x.shape[-1]
        w = self.param("kernel", torch_uniform_init(cin * 8),
                       (8, cin, self.features))
        return sc.up_conv2(x, w, parent_idx, child_kidx, child_idx,
                           self.compute_dtype)


class Conv1x1(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", torch_uniform_init(cin), (cin, self.features))
        return sc.conv1x1(x, w, self.compute_dtype)


class ResidualBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN + (1x1-BN shortcut) -> ReLU.

    Reference ``models/spvcnn.py:53-79`` (always stride 1 in SPVCNN).
    """

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, nbr_idx, mask, train: bool, slot_idx=None):
        cin = x.shape[-1]
        h = SubMConv3(self.features, self.compute_dtype)(x, nbr_idx, slot_idx)
        h = MaskedBatchNorm(out_dtype=self.compute_dtype)(h, mask, train)
        h = nn.relu(h)
        h = SubMConv3(self.features, self.compute_dtype)(h, nbr_idx, slot_idx)
        h = MaskedBatchNorm(out_dtype=self.compute_dtype)(h, mask, train)
        if cin == self.features:
            shortcut = x
        else:
            shortcut = Conv1x1(self.features, self.compute_dtype)(x)
            shortcut = MaskedBatchNorm(out_dtype=self.compute_dtype)(shortcut, mask, train)
        return nn.relu(h + shortcut)


class PointTransform(nn.Module):
    """Linear + BN1d + ReLU on the point stream (``models/spvcnn.py:164-180``)."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, train: bool):
        h = TorchLinear(self.features, compute_dtype=self.compute_dtype)(x)
        h = MaskedBatchNorm(out_dtype=self.compute_dtype)(h, mask, train)
        return nn.relu(h)


class SPVCNN(nn.Module):
    """The sparse UNet backbone; returns per-point features [N, cs[8]].

    ``fusion``: None | 'early' | 'middle' — which injection transform to
    create.  The actual image features arrive via ``fusion_feats`` at call
    time ([N, 96], already lifted to points and gradient-stopped).
    """

    cr: float = 1.0
    in_channels: int = 4
    fusion: Optional[str] = None
    dropout_rate: float = 0.3
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def cs(self) -> Sequence[int]:
        base = [32, 32, 64, 128, 256, 256, 128, 96, 96]
        return [int(self.cr * c) for c in base]

    @nn.compact
    def __call__(self, pt_feats, hier: Hierarchy, train: bool = False,
                 fusion_feats=None):
        cs = self.cs
        cdt = self.compute_dtype
        L = hier.levels
        masks = [l.valid for l in L]

        def drop(x):
            if train and self.dropout_rate > 0:
                return nn.Dropout(self.dropout_rate, deterministic=False)(x)
            return x

        # ---- initial voxelize: identity permutation (points == L0 voxels).
        x0 = sc.gather_rows(pt_feats, hier.vox0_point_idx)

        # ---- stem @ L0 (models/spvcnn.py:98-102)
        x0 = SubMConv3(cs[0], cdt, name="stem0")(x0, L[0].nbr_idx,
                                                 L[0].slot_idx)
        x0 = MaskedBatchNorm(out_dtype=cdt, name="stem0_bn")(x0, masks[0], train)
        x0 = nn.relu(x0)
        x0 = SubMConv3(cs[0], cdt, name="stem1")(x0, L[0].nbr_idx,
                                                 L[0].slot_idx)
        x0 = MaskedBatchNorm(out_dtype=cdt, name="stem1_bn")(x0, masks[0], train)
        x0 = nn.relu(x0)

        # ---- z0 = voxel_to_point(x0) — identity gather at stride 1.
        z0 = sc.gather_rows(x0, hier.pt_sorted_pos)
        if self.fusion == "early":
            z0 = z0 + _fusion_transform(self, cs[0], fusion_feats,
                                        hier.pt_valid, train)

        # ---- encoder. point_to_voxel(x0, z0) at stride 1 is the inverse
        # permutation of the z0 gather, so without early fusion the encoder
        # input is exactly x0; with it, the fused point stream is re-voxelized
        # (reference early_fusion.py:41 -> spvcnn stage chain).
        skips = [None] * 5
        skips[0] = x0  # up4 skip is ALWAYS the stem output (spvcnn.py:228)
        if self.fusion == "early":
            feats_in = sc.gather_rows(z0, hier.vox0_point_idx)
        else:
            feats_in = x0
        xs = [None] * 5
        xs[0] = feats_in
        down_feats = [cs[0], cs[1], cs[2], cs[3]]
        out_feats = [cs[1], cs[2], cs[3], cs[4]]
        for i in range(4):
            lvl = L[i + 1]
            h = DownConv2(down_feats[i], cdt,
                          name=f"stage{i+1}_down")(
                feats_in, lvl.child_idx, L[i].parent_idx, L[i].child_kidx)
            h = MaskedBatchNorm(out_dtype=cdt, name=f"stage{i+1}_down_bn")(h, masks[i + 1], train)
            h = nn.relu(h)
            h = ResidualBlock(out_feats[i], cdt, name=f"stage{i+1}_res1")(
                h, lvl.nbr_idx, masks[i + 1], train, lvl.slot_idx)
            h = ResidualBlock(out_feats[i], cdt, name=f"stage{i+1}_res2")(
                h, lvl.nbr_idx, masks[i + 1], train, lvl.slot_idx)
            xs[i + 1] = h
            skips[i + 1] = h
            feats_in = h

        # ---- z1 = v2p(x4) + PT0(z0) (+ middle fusion injection)
        z1 = sc.devoxelize_trilinear(xs[4], hier.pt_corner_idx[4],
                                     hier.pt_corner_w[4],
                                     plan=sc.devox_plan(hier, 4),
                                     compute_dtype=cdt)
        z1 = z1 + PointTransform(cs[4], cdt, name="point_transform0")(
            z0, hier.pt_valid, train)
        if self.fusion == "middle":
            z1 = z1 + _fusion_transform(self, cs[4], fusion_feats,
                                        hier.pt_valid, train)

        # ---- decoder stage 1+2 (L4 -> L3 -> L2)
        y = sc.voxelize_mean(z1, hier.pt_voxel_idx[4], hier.pt_valid,
                             L[4].valid.shape[0],
                             plan=sc.devox_plan(hier, 4), compute_dtype=cdt)
        y = drop(y)
        y = UpConv2(cs[5], cdt, name="up1_deconv")(
            y, L[3].parent_idx, L[3].child_kidx, L[4].child_idx)
        y = MaskedBatchNorm(out_dtype=cdt, name="up1_deconv_bn")(y, masks[3], train)
        y = nn.relu(y)
        y = jnp.concatenate([y, skips[3]], axis=-1)
        y = ResidualBlock(cs[5], cdt, name="up1_res1")(y, L[3].nbr_idx,
                                                       masks[3], train,
                                                       L[3].slot_idx)
        y = ResidualBlock(cs[5], cdt, name="up1_res2")(y, L[3].nbr_idx,
                                                       masks[3], train,
                                                       L[3].slot_idx)

        y = UpConv2(cs[6], cdt, name="up2_deconv")(
            y, L[2].parent_idx, L[2].child_kidx, L[3].child_idx)
        y = MaskedBatchNorm(out_dtype=cdt, name="up2_deconv_bn")(y, masks[2], train)
        y = nn.relu(y)
        y = jnp.concatenate([y, skips[2]], axis=-1)
        y = ResidualBlock(cs[6], cdt, name="up2_res1")(y, L[2].nbr_idx,
                                                       masks[2], train,
                                                       L[2].slot_idx)
        y = ResidualBlock(cs[6], cdt, name="up2_res2")(y, L[2].nbr_idx,
                                                       masks[2], train,
                                                       L[2].slot_idx)

        # ---- z2 = v2p(y2) + PT1(z1)
        z2 = sc.devoxelize_trilinear(y, hier.pt_corner_idx[2],
                                     hier.pt_corner_w[2],
                                     plan=sc.devox_plan(hier, 2),
                                     compute_dtype=cdt)
        z2 = z2 + PointTransform(cs[6], cdt, name="point_transform1")(
            z1, hier.pt_valid, train)

        # ---- decoder stage 3+4 (L2 -> L1 -> L0)
        y = sc.voxelize_mean(z2, hier.pt_voxel_idx[2], hier.pt_valid,
                             L[2].valid.shape[0],
                             plan=sc.devox_plan(hier, 2), compute_dtype=cdt)
        y = drop(y)
        y = UpConv2(cs[7], cdt, name="up3_deconv")(
            y, L[1].parent_idx, L[1].child_kidx, L[2].child_idx)
        y = MaskedBatchNorm(out_dtype=cdt, name="up3_deconv_bn")(y, masks[1], train)
        y = nn.relu(y)
        y = jnp.concatenate([y, skips[1]], axis=-1)
        y = ResidualBlock(cs[7], cdt, name="up3_res1")(y, L[1].nbr_idx,
                                                       masks[1], train,
                                                       L[1].slot_idx)
        y = ResidualBlock(cs[7], cdt, name="up3_res2")(y, L[1].nbr_idx,
                                                       masks[1], train,
                                                       L[1].slot_idx)

        y = UpConv2(cs[8], cdt, name="up4_deconv")(
            y, L[0].parent_idx, L[0].child_kidx, L[1].child_idx)
        y = MaskedBatchNorm(out_dtype=cdt, name="up4_deconv_bn")(y, masks[0], train)
        y = nn.relu(y)
        y = jnp.concatenate([y, skips[0]], axis=-1)
        y = ResidualBlock(cs[8], cdt, name="up4_res1")(y, L[0].nbr_idx,
                                                       masks[0], train,
                                                       L[0].slot_idx)
        y = ResidualBlock(cs[8], cdt, name="up4_res2")(y, L[0].nbr_idx,
                                                       masks[0], train,
                                                       L[0].slot_idx)

        # ---- z3 = v2p(y4) + PT2(z2) — identity gather at stride 1.
        z3 = sc.gather_rows(y, hier.pt_sorted_pos)
        z3 = z3 + PointTransform(cs[8], cdt, name="point_transform2")(
            z2, hier.pt_valid, train)
        return z3


def _fusion_transform(mdl: SPVCNN, out_dim: int, fusion_feats, pt_valid,
                      train: bool):
    assert fusion_feats is not None, "fusion model called without image feats"
    h = TorchLinear(out_dim, compute_dtype=mdl.compute_dtype,
                    name="fusion_linear")(fusion_feats)
    h = MaskedBatchNorm(out_dtype=mdl.compute_dtype, name="fusion_bn")(h, pt_valid, train)
    return nn.relu(h)
