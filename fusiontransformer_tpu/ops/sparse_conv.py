"""Sparse convolution compute ops: gather -> dense GEMM (MXU) -> scatter.

TPU-native equivalents of torchsparse's gather-GEMM-scatter CUDA kernels
(reference uses ``spnn.Conv3d`` in ``models/spvcnn.py:26-75``).  Instead of a
rulebook of variable-length per-offset lists, each op consumes the
fixed-capacity index maps built by ``ops.hierarchy``:

* ``subm_conv3``  — kernel-size-3 stride-1 conv: one fat [V, 27*Cin] x
  [27*Cin, Cout] GEMM (all 27 taps in a single MXU matmul, rather than 27
  small ones);
* ``down_conv2``  — kernel-size-2 stride-2 conv via the ``child_idx`` map:
  [Vcoarse, 8*Cin] x [8*Cin, Cout] GEMM;
* ``up_conv2``    — kernel-size-2 stride-2 *transposed* conv: each fine voxel
  has exactly one (parent, offset) pair, so we compute all 8 offset products
  at the coarse level (one GEMM) and gather [parent, offset] per fine voxel;
* ``conv1x1``     — plain matmul (used by residual shortcuts);
* ``voxelize_mean`` / ``devoxelize_trilinear`` — point<->voxel transfer,
  replacing ``spf.spvoxelize`` / ``spf.spdevoxelize`` + ``calc_ti_weights``
  (reference ``models/utils.py:19-27,81-87``).

All ops read through a zero "pad row" at index ``V`` so sentinel indices
contribute zeros — this is how masking stays branch-free.  Weights are cast to
``compute_dtype`` (bfloat16 by default) and accumulation happens in float32
(``preferred_element_type``), the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_row(feats):
    """Append one zero row so sentinel index V gathers zeros."""
    return jnp.concatenate(
        [feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], axis=0)


def subm_conv3(feats, w, nbr_idx, compute_dtype=jnp.bfloat16):
    """ks=3 stride=1 sparse conv.

    Args:
      feats: [V, Cin] float.
      w: [27, Cin, Cout] kernel (offset order per ops.hierarchy docstring).
      nbr_idx: [V, 27] int32 from Level.nbr_idx (sentinel V).
    Returns:
      [V, Cout] float32.
    """
    V, cin = feats.shape
    cout = w.shape[-1]
    fe = pad_row(feats.astype(compute_dtype))
    g = fe[nbr_idx]                                   # [V, 27, Cin]
    g = g.reshape(V, 27 * cin)
    wk = w.astype(compute_dtype).reshape(27 * cin, cout)
    return jnp.dot(g, wk, preferred_element_type=jnp.float32)


def down_conv2(feats_fine, w, child_idx, compute_dtype=jnp.bfloat16):
    """ks=2 stride=2 sparse conv (downsample).

    Args:
      feats_fine: [Vf, Cin] at level l.
      w: [8, Cin, Cout].
      child_idx: [Vc, 8] int32 from Level(l+1).child_idx (sentinel Vf).
    Returns:
      [Vc, Cout] float32 at level l+1.
    """
    vc = child_idx.shape[0]
    cin = feats_fine.shape[-1]
    cout = w.shape[-1]
    fe = pad_row(feats_fine.astype(compute_dtype))
    g = fe[child_idx].reshape(vc, 8 * cin)
    wk = w.astype(compute_dtype).reshape(8 * cin, cout)
    return jnp.dot(g, wk, preferred_element_type=jnp.float32)


def up_conv2(feats_coarse, w, parent_idx, child_kidx, compute_dtype=jnp.bfloat16):
    """ks=2 stride=2 transposed sparse conv (upsample).

    Output coords are the (precomputed) fine-level coord set, exactly like
    torchsparse's cached coord_maps guarantee in the reference UNet
    (``models/spvcnn.py:128-162``).

    Args:
      feats_coarse: [Vc, Cin] at level l+1.
      w: [8, Cin, Cout].
      parent_idx: [Vf] int32 into level l+1 (sentinel Vc).
      child_kidx: [Vf] int32 in [0, 8).
    Returns:
      [Vf, Cout] float32 at level l.
    """
    vc, cin = feats_coarse.shape
    cout = w.shape[-1]
    fc = feats_coarse.astype(compute_dtype)
    wk = w.astype(compute_dtype).transpose(1, 0, 2).reshape(cin, 8 * cout)
    y = jnp.dot(fc, wk, preferred_element_type=jnp.float32)   # [Vc, 8*Cout]
    y = y.reshape(vc, 8, cout)
    y = pad_row(y)                                            # [Vc+1, 8, Cout]
    return y[parent_idx, child_kidx]


def conv1x1(feats, w, compute_dtype=jnp.bfloat16):
    """ks=1 sparse conv = per-voxel linear map."""
    return jnp.dot(feats.astype(compute_dtype), w.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def voxelize_mean(pt_feats, pt_voxel_idx, pt_valid, num_voxels):
    """Average-pool point features into their containing voxels.

    Matches ``spf.spvoxelize`` + ``spcount`` semantics (mean, reference
    ``models/utils.py:19-27``).  Sentinel indices land in a dropped overflow
    segment.
    """
    ids = jnp.where(pt_valid, pt_voxel_idx, num_voxels)
    sums = jax.ops.segment_sum(
        pt_feats * pt_valid[:, None].astype(pt_feats.dtype), ids,
        num_segments=num_voxels + 1)[:num_voxels]
    counts = jax.ops.segment_sum(
        pt_valid.astype(jnp.float32), ids,
        num_segments=num_voxels + 1)[:num_voxels]
    return sums / jnp.maximum(counts, 1.0)[:, None]


def devoxelize_trilinear(vox_feats, corner_idx, corner_w):
    """Trilinear voxel->point interpolation (``spdevoxelize`` equivalent).

    Args:
      vox_feats: [V, C].
      corner_idx: [N, 8] int32 (sentinel V -> zero contribution).
      corner_w: [N, 8] float32 (already zeroed at missing corners, matching
        ``calc_ti_weights``; no renormalization).
    Returns:
      [N, C] float32.
    """
    fe = pad_row(vox_feats)
    g = fe[corner_idx]                                # [N, 8, C]
    return jnp.sum(g * corner_w[:, :, None].astype(g.dtype), axis=1)


def gather_rows(feats, idx):
    """Gather with a zero pad row (sentinel index = len(feats))."""
    return pad_row(feats)[idx]
