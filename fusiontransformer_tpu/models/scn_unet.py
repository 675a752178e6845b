"""SparseConvNet-style recursive UNet (reference ``models/scn_unet.py``).

Legacy xMUDA 3D backbone.  The SCN stack (InputLayer mode 4 -> Submanifold
3x3x3 -> recursive scn.UNet over ``num_planes`` levels -> BatchNormReLU ->
OutputLayer) maps onto the same sparse-op layer as SPVCNN:

* InputLayer(mode=4) average-pools duplicate points per voxel; our contract
  (inputs pre-deduplicated by sparse_quantize) makes it an identity gather;
* SubmanifoldConvolution = ``subm_conv3`` (output coords == input coords);
* the recursive UNet's pre-activation blocks (BNReLU -> SubmConv), stride-2
  down/Deconvolution up, and JoinTable concat use the precomputed hierarchy
  kernel maps;
* OutputLayer maps voxel features back to input point order.

Needs a hierarchy built with ``num_planes`` levels (7 by default, vs
SPVCNN's 5).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fusiontransformer_tpu.models.layers import MaskedBatchNorm
from fusiontransformer_tpu.models.spvcnn import DownConv2, SubMConv3, UpConv2
from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import Hierarchy


class _BNReLUConv(nn.Module):
    """Pre-activation submanifold block: BNReLU -> SubmConv3 (scn block)."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, nbr_idx, mask, train: bool):
        h = MaskedBatchNorm(out_dtype=self.compute_dtype, name="bn")(
            x, mask, train)
        h = nn.relu(h)
        return SubMConv3(self.features, self.compute_dtype, name="conv")(
            h, nbr_idx)


class UNetSCN(nn.Module):
    in_channels: int = 4
    m: int = 16                 # feature multiplier per level
    block_reps: int = 1
    residual_blocks: bool = False
    num_planes: int = 7
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def out_channels(self):
        return self.m

    @nn.compact
    def __call__(self, pt_feats, hier: Hierarchy, train: bool = False):
        assert len(hier.levels) >= self.num_planes, (
            f"UNetSCN needs a {self.num_planes}-level hierarchy, got "
            f"{len(hier.levels)}")
        cdt = self.compute_dtype
        planes = [(n + 1) * self.m for n in range(self.num_planes)]
        L = hier.levels

        # InputLayer (identity permutation) + entry submanifold conv.
        x = sc.gather_rows(pt_feats, hier.vox0_point_idx)
        x = SubMConv3(self.m, cdt, name="input_conv")(x, L[0].nbr_idx)

        def u(level, x):
            mask = L[level].valid
            nbr = L[level].nbr_idx
            for r in range(self.block_reps):
                x = _BNReLUConv(planes[level], cdt,
                                name=f"lvl{level}_enc{r}")(x, nbr, mask, train)
            if level == self.num_planes - 1:
                return x
            # Down: BNReLU -> Convolution ks2 s2.
            h = MaskedBatchNorm(out_dtype=cdt, name=f"lvl{level}_down_bn")(
                x, mask, train)
            h = nn.relu(h)
            h = DownConv2(planes[level + 1], cdt,
                          name=f"lvl{level}_down")(
                h, L[level + 1].child_idx, L[level].parent_idx,
                L[level].child_kidx)
            h = u(level + 1, h)
            # Up: BNReLU -> Deconvolution ks2 s2.
            h = MaskedBatchNorm(out_dtype=cdt, name=f"lvl{level}_up_bn")(
                h, L[level + 1].valid, train)
            h = nn.relu(h)
            h = UpConv2(planes[level], cdt, name=f"lvl{level}_up")(
                h, L[level].parent_idx, L[level].child_kidx,
                L[level + 1].child_idx)
            # JoinTable concat + decode blocks.
            x = jnp.concatenate([x, h.astype(x.dtype)], axis=-1)
            for r in range(self.block_reps):
                x = _BNReLUConv(planes[level], cdt,
                                name=f"lvl{level}_dec{r}")(x, nbr, mask, train)
            return x

        x = u(0, x)
        x = MaskedBatchNorm(name="out_bn")(x, L[0].valid, train)
        x = nn.relu(x)
        # OutputLayer: voxel -> original point order.
        return sc.gather_rows(x, hier.pt_sorted_pos)
