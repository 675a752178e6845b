"""Affine grid generation + bilinear grid sampling.

XLA:TPU has no native ``grid_sample``; this implements torch's
``F.affine_grid`` / ``F.grid_sample`` (align_corners=False, zeros padding)
semantics used by the reference SpatialTransformer
(``models/transformers.py:126-135``) as plain gathers + lerps, which XLA fuses
into a handful of vectorized HBM reads.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_grid(theta, out_h: int, out_w: int):
    """torch.nn.functional.affine_grid parity (align_corners=False).

    Args:
      theta: [B, 2, 3] affine matrices.
    Returns:
      grid: [B, out_h, out_w, 2] normalized (x, y) sample coords in [-1, 1].
    """
    # Normalized pixel centers (align_corners=False): (2i + 1)/size - 1.
    ys = (2.0 * jnp.arange(out_h) + 1.0) / out_h - 1.0
    xs = (2.0 * jnp.arange(out_w) + 1.0) / out_w - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")       # [H, W]
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)          # [H, W, 3]
    # grid = theta @ [x, y, 1]^T
    return jnp.einsum("bij,hwj->bhwi", theta, base)    # [B, H, W, 2] (x, y)


def grid_sample_bilinear(img, grid):
    """torch.nn.functional.grid_sample parity (bilinear, zeros padding,
    align_corners=False).

    Args:
      img: [B, H, W, C] NHWC.
      grid: [B, Ho, Wo, 2] normalized (x, y).
    Returns:
      [B, Ho, Wo, C].
    """
    b, h, w, c = img.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        bidx = jnp.arange(b)[:, None, None]
        v = img[bidx, yc, xc]                          # [B, Ho, Wo, C]
        return v * inb[..., None].astype(img.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    fx = fx[..., None].astype(img.dtype)
    fy = fy[..., None].astype(img.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
