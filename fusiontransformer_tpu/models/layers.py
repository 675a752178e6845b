"""Shared flax building blocks: torch-style init and masked batch norm.

Masked BN is required because the TPU pipeline pads voxel buffers to static
capacities; the reference (``spnn.BatchNorm`` in ``models/spvcnn.py:30``)
never sees padding, so batch statistics must be computed over *valid* rows
only to match its numerics.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default conv/linear init."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the valid rows of a padded [V, C] buffer.

    Semantics follow torch BatchNorm1d (eps 1e-5, momentum 0.1, biased batch
    variance used both for normalization and the running update — the running
    update bias is negligible and documented here as a deliberate deviation).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    out_dtype: Optional[jnp.dtype] = None  # e.g. bf16 to halve HBM traffic

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x: [V, C] float; mask: [V] bool.  Statistics always in float32.
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        xf = x.astype(jnp.float32)
        if train:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m, axis=0) / n
            var = jnp.sum((xf * m) ** 2, axis=0) / n - mean**2
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) / jnp.sqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.out_dtype) if self.out_dtype else y


class MaskedBatchNorm2d(nn.Module):
    """BatchNorm2d over [B, H, W, C] (NHWC); no padding mask needed for dense
    images, but kept in the same style for uniformity."""

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.mean(x**2, axis=(0, 1, 2)) - mean**2
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * scale + bias


class TorchLinear(nn.Module):
    """nn.Linear with torch default init.

    ``reduce_axis`` makes the layer the row-parallel half of a Megatron
    tensor-parallel pair: the matmul contracts this rank's input shard, a
    ``psum`` over the named mesh axis rebuilds the full product, and the
    (replicated) bias is added after the reduction so it is counted once.
    """

    features: int
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    reduce_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param("kernel", torch_uniform_init(fan_in),
                       (fan_in, self.features))
        y = jnp.dot(x.astype(self.compute_dtype), w.astype(self.compute_dtype),
                    preferred_element_type=jnp.float32)
        if self.reduce_axis is not None:
            from fusiontransformer_tpu.parallel.tensor_parallel import (
                psum_fwd_identity_bwd)
            y = psum_fwd_identity_bwd(y, self.reduce_axis)
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + b
        return y
