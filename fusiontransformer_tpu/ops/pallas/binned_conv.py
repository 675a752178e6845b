"""Pallas TPU kernel: fused binned-slot sparse conv (gather-row reduction).

The ks=3 submanifold conv is the flagship's wall: dense tap-major gathers
move 26 rows per voxel at the gather engine's row-rate limit (~540M rows/s,
see ROADMAP "the gather wall").  LiDAR surfaces are thin — voxels have at
most ~15 live ks3 neighbors — so the K-slot maps (``ops.hierarchy``
``tap_slots``) cut gather rows 26 -> K.  The pure-XLA binned path
(``sparse_conv._subm3s``) loses anyway because rebuilding the tap-major
tensor ``B[v, t, c] = feats[nbr(v, t)]`` materializes a full extra HBM pass
and its [K, 27] binning dot runs at ~3% of roofline (ROADMAP "binned-slot
conv": 74.5 ms vs 29 ms dense at train shapes).

This kernel fuses binning + weight contraction so ``B`` never leaves VMEM
(the "block-diagonal Pallas binning kernel" ROADMAP sketches):

  * input is the K-row gather output in GROUPED layout
    ``g[gr, j, :] = feats[src[gr, j]]`` with j = (voxel-in-group, slot),
    8 voxels x K slots = 128 = one full MXU contraction dim — produced by
    one XLA gather (K/26 of the dense rows);
  * per 8-voxel group, ONE one-hot MXU matmul bins the 128 slot rows into
    8*27 = 216 tap-major (t, voxel) bins — block-diagonal by construction;
  * the weight contraction ``out[v] = sum_t B[t, v] @ w[t]`` runs on the
    binned tile while it is still in VMEM, as 27 static full-height
    matmuls (tap slices of the bin axis are 8-sublane aligned, so no
    relayout reshapes — Mosaic rejects lane<->sublane reshapes).

Replaces torchsparse's rulebook gather-GEMM-scatter (reference
``models/spvcnn.py:26-75`` via ``spnn.Conv3d``) for the stride-1 ks=3 case.
The backward rides the same mirror symmetry as the XLA paths
(``sparse_conv._subm3s_bwd``): dfeats is this kernel applied to ``dout``
slots with the column-reversed kernel, and dW accumulates
``feats^T @ B(dout)`` in VMEM scratch across the sequential grid — both
from the SAME binned dout tile, one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pick_block(c, co, v):
    """Voxel rows per grid block, sized so the [GB, 216, max(C, Co)] binned
    tile + grouped input + weights fit VMEM (~16 MB) with double buffering;
    halved until it divides V (caps are 128-multiples, so 128 always does)."""
    width = max(c, co)
    if width >= 256:
        block = 64
    elif width >= 128:
        block = 128
    else:
        block = 256
    while v % block:
        block //= 2
    return block


def _oh216(tap, k, mxu_dtype):
    """Block-diagonal one-hot [GB, 216, S]: oh[g, t*8+vo, j] = 1 iff slot j
    feeds bin (t, vo) (sentinel slots map nowhere).

    Bins are TAP-MAJOR (u = t*8 + vo) so each tap's 8-voxel slice of the
    bin axis is one aligned sublane tile — sliceable without relayout.

    Two slot layouts share this:
    * per-voxel K slots (``k`` an int, S = 8K): ``tap`` holds tap ids and
      the owning voxel is positional, ``u = tap*8 + j//K`` (sentinel tap 27
      lands at >= 216, out of bin range, automatically);
    * GROUP-POOLED slots (``k`` is None): ``tap`` holds the bin id
      ``t*8 + vo`` directly — the owning voxel is data, not layout, so the
      S slots of a group are shared by its 8 voxels (host-side exact
      compaction, ROADMAP r5; sentinel >= 216).

    Built as ONE compare on the big [GB, 216, S] shape — the 3-iota/
    3-compare formulation cost ~3x the VPU work and dominated the kernel
    at narrow channels."""
    gb, s = tap.shape
    if k is None:
        u_eff = tap                                      # [GB, S] bin ids
    else:
        j_vo = jax.lax.broadcasted_iota(jnp.int32, (gb, s), 1) // k
        u_eff = tap * 8 + j_vo                           # [GB, S]
    u_ids = jax.lax.broadcasted_iota(jnp.int32, (gb, 216, s), 1)
    return (u_eff[:, None, :] == u_ids).astype(mxu_dtype)


def _bin216(tap_ref, g_ref, k, mxu_dtype):
    """[GB, 216, C] binned tile: B[g, t*8+vo, c] = sum over that voxel's
    slots with tap t of the gathered rows (<= 1 per bin, exact)."""
    oh = _oh216(tap_ref[:], k, mxu_dtype)
    g = g_ref[:].astype(mxu_dtype)                       # [GB, S, C]
    return jax.lax.dot_general(
        oh, g, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _tap_rows(b, t, bv, c):
    """Rows of tap t from the [GB, 216, C] binned tile as [BV, C] (aligned
    sublane slice + leading-dim merge; both relayout-free)."""
    return b[:, t * 8:(t + 1) * 8, :].reshape(bv, c)


def _fwd_kernel(tap_ref, g_ref, w_ref, out_ref, *, bv, k, c, co, mxu_dtype):
    b = _bin216(tap_ref, g_ref, k, mxu_dtype)            # [GB, 216, C] f32
    acc = jnp.zeros((bv, co), jnp.float32)
    for t in range(27):
        xt = _tap_rows(b, t, bv, c).astype(mxu_dtype)
        acc += jax.lax.dot(xt, w_ref[t * c:(t + 1) * c, :],
                           preferred_element_type=jnp.float32)
    out_ref[:] = acc


def binned_conv_fwd(g, tap_pack, w, *, block=None, interpret=None,
                    precise=False, grouped=False):
    """out[v] = sum_k g_rows(v, k) @ w[tap[v, k]]  (sentinel tap 27 -> skip).

    Args:
      g: [V // 8, S, C] gathered neighbor rows in grouped layout
         (``pad_row(feats)[src_pack]``); S = 8*K slots (per-voxel maps) or
         the group-pool size (``grouped=True``); rows at sentinel src
         indices must already be zero (pad-row gather).
      tap_pack: [V // 8, S] int32 — per-voxel tap ids (``pack_slots``,
         8*K a multiple of 128) or, with ``grouped=True``, direct bin ids
         ``tap*8 + voxel_in_group`` (sentinel >= 216; S any multiple of 8).
      w: [27 * Cin, Cout] flattened kernel (tap-major rows).
    Returns:
      [V, Cout] float32.
    """
    ng, n8k, c = g.shape
    v = ng * 8
    k = None if grouped else n8k // 8
    co = w.shape[1]
    if block is None:
        block = _pick_block(c, co, v)
    assert v % block == 0 and block % 8 == 0, (v, block)
    assert n8k % (8 if grouped else 128) == 0, (n8k, grouped)
    mxu_dtype = jnp.float32 if precise else jnp.bfloat16
    gb = block // 8
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bv=block, k=k, c=c, co=co,
                          mxu_dtype=mxu_dtype),
        grid=(v // block,),
        in_specs=[
            pl.BlockSpec((gb, n8k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, n8k, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * c, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, co), jnp.float32),
        interpret=_interpret(interpret),
    )(tap_pack, g, w)


def _bwd_kernel(tap_ref, gd_ref, f_ref, wrev_ref, dx_ref, dw_ref, dwacc_ref,
                *, bv, k, c, co, mxu_dtype, nblocks):
    """Fused backward block: bins dout slots once, emits dX and accumulates
    dW (mirror-tap order) in VMEM scratch; the last block flushes dW."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)

    bd = _bin216(tap_ref, gd_ref, k, mxu_dtype)          # [GB, 216, Co]
    f = f_ref[:].astype(mxu_dtype)                       # [BV, C]
    acc = jnp.zeros((bv, c), jnp.float32)
    for t in range(27):
        # bd slice t holds dout[nbr(u, t)] rows for this block's voxels.
        xt = _tap_rows(bd, t, bv, co).astype(mxu_dtype)
        # dX[u] += dout[nbr(u, t)] @ W[26-t]^T  (wrev pre-reversed host-side).
        acc += jax.lax.dot(xt, wrev_ref[t * co:(t + 1) * co, :],
                           preferred_element_type=jnp.float32)
        # dW'[t] += feats^T @ xt — contraction over the block's voxel axis.
        dwacc_ref[:, t * co:(t + 1) * co] += jax.lax.dot_general(
            f, xt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dx_ref[:] = acc

    @pl.when(i == nblocks - 1)
    def _flush():
        dw_ref[:] = dwacc_ref[:]


def binned_conv_bwd(gd, tap_pack, feats, w, *, block=None, interpret=None,
                    precise=False, grouped=False):
    """Backward of the fused binned conv (submanifold mirror symmetry:
    nbr(v, t) = u iff nbr(u, 26-t) = v, so dfeats is a binned conv of dout
    through the column-reversed kernel with the SAME slot maps, and the
    binned dout tile it builds is exactly the per-tap-scattered dout dW
    needs — reference rulebook backward, ``sparse_conv._subm3s_bwd``).

    Args:
      gd: [V // 8, 8*K, Cout] gathered dout rows in grouped layout
          (``pad_row(dout)[src_pack]``) — gd rows are dout[nbr(u, k)].
      tap_pack: [V // 8, 8*K] int32 packed tap ids (same maps as forward).
      feats: [V, Cin] forward input (padded voxel rows contribute zero to
          dW because their bd rows are all-sentinel, exactly like the XLA
          binned path).
      w: [27, Cin, Cout] kernel.
    Returns:
      (dfeats [V, Cin] f32, dw [27, Cin, Cout] f32).
    """
    ng, n8k, co = gd.shape
    v = ng * 8
    k = None if grouped else n8k // 8
    c = feats.shape[1]
    if block is None:
        block = _pick_block(c, co, v)
    assert v % block == 0 and block % 8 == 0, (v, block)
    mxu_dtype = jnp.float32 if precise else jnp.bfloat16
    # dX pairs bin t with W[26-t]: reverse taps once on the tiny weight.
    wrev = jnp.transpose(w[::-1], (0, 2, 1)).reshape(27 * co, c)
    nblocks = v // block
    gb = block // 8
    dx, dwT = pl.pallas_call(
        functools.partial(_bwd_kernel, bv=block, k=k, c=c, co=co,
                          mxu_dtype=mxu_dtype, nblocks=nblocks),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((gb, n8k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, n8k, co), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * co, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 27 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((v, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 27 * co), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((c, 27 * co), jnp.float32)],
        interpret=_interpret(interpret),
    )(tap_pack, gd, feats, wrev)
    # dwT[c, t*Co+o] holds the FORWARD-tap-order E[t, c, o] =
    # sum_v feats[v, c] * dout[nbr(v, t)][o]; dW[t'] = E[26-t'].
    dw = jnp.transpose(dwT.reshape(c, 27, co), (1, 0, 2))[::-1]
    return dx, dw


def pack_slots(x):
    """[V, K] slot map -> [V // 8, 8*K] grouped rows (8 voxels per row, the
    kernel's native layout; 8*K must be a lane multiple of 128)."""
    v, k = x.shape
    assert v % 8 == 0, v
    assert (8 * k) % 128 == 0, k
    return x.reshape(v // 8, 8 * k)
