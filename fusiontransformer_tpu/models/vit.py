"""Vision transformer (DeiT-Base distilled @384) with per-block feature taps.

TPU-native re-implementation of the reference's timm-based backbone
(reference ``models/transformers.py:11-100``): DeiT-Base, patch 16, embed 768,
depth 12, heads 12, with a distillation token; ``forward_blocks`` returns the
output of every block with the cls/dist tokens stripped
(``transformers.py:36-45``).

Design notes (TPU):
* patch embedding is a reshape + one [B*576, 768] x [768, 768] GEMM (a 16x16
  stride-16 conv is exactly a per-patch linear map) — MXU-friendly, no conv op;
* attention runs at 578 tokens in bfloat16 with float32 softmax;
* an optional ``remat`` flag checkpoints each block to trade FLOPs for HBM
  during training (jax.checkpoint; no reference equivalent).

Patch flattening layout is (row, col, channel) == HWC; the timm weight
converter in ``utils/torch_convert.py`` permutes torch's (C, H, W) kernels
accordingly.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fusiontransformer_tpu.models.layers import TorchLinear


def _tp_input(x, tp: int, tp_axis):
    """Megatron ``f`` at a column-parallel region's replicated input."""
    if tp <= 1:
        return x
    from fusiontransformer_tpu.parallel.tensor_parallel import (
        replicate_fwd_psum_bwd)
    return replicate_fwd_psum_bwd(x, tp_axis)


class Mlp(nn.Module):
    hidden: int
    out: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    tp: int = 1                          # tensor-parallel ranks (hidden dim)
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        assert self.hidden % self.tp == 0, (self.hidden, self.tp)
        x = _tp_input(x, self.tp, self.tp_axis)
        x = TorchLinear(self.hidden // self.tp,
                        compute_dtype=self.compute_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = TorchLinear(self.out, compute_dtype=self.compute_dtype,
                        reduce_axis=self.tp_axis if self.tp > 1 else None,
                        name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    tp: int = 1                          # tensor-parallel ranks (head dim)
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        assert self.num_heads % self.tp == 0, (self.num_heads, self.tp)
        h = self.num_heads // self.tp    # heads on this rank
        hd = d // self.num_heads
        x = _tp_input(x, self.tp, self.tp_axis)
        qkv = TorchLinear(3 * h * hd, compute_dtype=self.compute_dtype,
                          name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # [b, h, n, hd]
        scale = hd ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q.astype(self.compute_dtype),
                          k.astype(self.compute_dtype),
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.compute_dtype),
                         v.astype(self.compute_dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
        return TorchLinear(self.dim, compute_dtype=self.compute_dtype,
                           reduce_axis=self.tp_axis if self.tp > 1 else None,
                           name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    tp: int = 1
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, self.compute_dtype,
                          tp=self.tp, tp_axis=self.tp_axis, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    self.compute_dtype, tp=self.tp, tp_axis=self.tp_axis,
                    name="mlp")(h)
        return x


class VisionTransformer2D(nn.Module):
    """DeiT backbone exposing per-block outputs (tokens stripped)."""

    img_size: int = 384
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    distilled: bool = True
    remat: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    tp: int = 1                          # tensor-parallel ranks (model axis)
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, images) -> Dict[str, jnp.ndarray]:
        # images: [B, H, W, 3] float32 NHWC, H == W == img_size.
        b = images.shape[0]
        p = self.patch_size
        g = self.img_size // p                     # 24
        n_patches = g * g                          # 576
        n_prefix = 2 if self.distilled else 1

        # Patch embed as one GEMM over HWC-flattened patches.
        x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, n_patches, p * p * 3)
        x = TorchLinear(self.embed_dim, compute_dtype=self.compute_dtype,
                        name="patch_embed")(x)

        cls_token = self.param("cls_token",
                               nn.initializers.truncated_normal(0.02),
                               (1, 1, self.embed_dim))
        prefix = [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim))]
        if self.distilled:
            dist_token = self.param("dist_token",
                                    nn.initializers.truncated_normal(0.02),
                                    (1, 1, self.embed_dim))
            prefix.append(jnp.broadcast_to(dist_token, (b, 1, self.embed_dim)))
        x = jnp.concatenate(prefix + [x], axis=1)  # [B, 578, 768]

        pos_embed = self.param("pos_embed",
                               nn.initializers.truncated_normal(0.02),
                               (1, n_prefix + n_patches, self.embed_dim))
        x = x + pos_embed

        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block)

        outputs = {}
        for i in range(self.depth):
            x = block_cls(self.embed_dim, self.num_heads,
                          compute_dtype=self.compute_dtype,
                          tp=self.tp, tp_axis=self.tp_axis,
                          name=f"block{i}")(x)
            outputs[str(i)] = x[:, n_prefix:, :]   # strip cls/dist tokens
        return outputs
