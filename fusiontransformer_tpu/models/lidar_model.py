"""LiDAR-only segmentation model (reference ``models/lidar_model.py:4-22``)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fusiontransformer_tpu.models.layers import TorchLinear
from fusiontransformer_tpu.models.spvcnn import SPVCNN


class LidarSeg(nn.Module):
    """SPVCNN backbone + single linear segmentation head."""

    num_classes: int
    cr: float = 1.0
    dropout_rate: float = 0.3
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, hier, train: bool = False):
        feats = SPVCNN(cr=self.cr, dropout_rate=self.dropout_rate,
                       compute_dtype=self.compute_dtype,
                       name="backbone")(batch["feats"], hier, train)
        logit = TorchLinear(self.num_classes, compute_dtype=self.compute_dtype,
                            name="linear")(feats)
        return {"lidar_seg_logit": logit, "lidar_feats": feats}
