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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _prec(cdt):
    """f32 compute means *true* f32: TPU's default matmul precision is a
    single bf16 pass, which is right for the bf16 production path but wrong
    for parity/debug runs that ask for float32."""
    return jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None


def pad_row(feats):
    """Append one zero row so sentinel index V gathers zeros."""
    return jnp.concatenate(
        [feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], axis=0)


def _float0(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# --------------------------------------------------------------------------- #
# ks=3 stride=1
#
# Layout: gathers are TAP-MAJOR ([27, V, C], indices nbr_idx.T) and the GEMM
# is a batched einsum over the tap axis.  The voxel-major [V, 27*C] fat-GEMM
# formulation forces XLA to relayout the gather output (minor dims swap from
# (tap, chan) to a flattened 27*C axis) — measured ~35% slower end to end on
# v5e (tools/microbench_conv.py; the relayout showed up as ~174 ms/step of
# "data formatting" in the train profile).
#
# Custom VJP: the 27-offset set is mirror-symmetric (offsets[26-k] ==
# -offsets[k]), so the adjoint of "gather neighbors" is itself a neighbor
# gather through the column-reversed kernel map — the backward pass needs NO
# scatter (XLA's autodiff scatter-adds are ~8x slower than gathers on TPU for
# these shapes).  The same symmetry makes the scattered dout that dW needs,
# sum_{v: nbr(v,d)=u} dout[v], equal to dout[nbr(u, 26-d)] — which the
# mirrored gd gather already holds — so the backward pass needs exactly ONE
# gather (no feats re-gather; measured ~1.8x faster at stem shapes).
#
# Center-tap skip: tap 13 is the identity map (nbr(u, 13) == u where the row
# is valid, sentinel otherwise), so its rows never need the gather engine —
# both passes gather 26 taps and add a direct masked matmul for the center
# (gathers are row-rate bound: 26/27 rows is a measured +3-4% per conv,
# +14% at L4 shapes, tools/microbench_conv.py).  The mask matters: the
# dense formulation zeroed invalid rows via the sentinel gather, so the
# direct term must zero them explicitly or garbage at padded rows leaks
# into out / dW.
# --------------------------------------------------------------------------- #

def _no_center(a):
    """Drop tap 13 (center/self) from a leading 27-tap axis."""
    return jnp.concatenate([a[:13], a[14:]], axis=0)


def _self_mask(x, nbr13, cdt):
    """Zero rows whose center tap is the sentinel (padded voxels)."""
    return jnp.where((nbr13 != x.shape[0])[:, None], x.astype(cdt), 0)


def _subm3_impl(feats, w, nbr_idx, cdt):
    nbrT = nbr_idx.T
    wc = w.astype(cdt)
    g = pad_row(feats.astype(cdt))[_no_center(nbrT)]   # [26, V, Cin]
    out = jnp.einsum("kvc,kco->vo", g, _no_center(wc),
                     precision=_prec(cdt),
                     preferred_element_type=jnp.float32)
    return out + jnp.dot(_self_mask(feats, nbrT[13], cdt), wc[13],
                         precision=_prec(cdt),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _subm3(feats, w, nbr_idx, cdt):
    return _subm3_impl(feats, w, nbr_idx, cdt)


def _subm3_fwd(feats, w, nbr_idx, cdt):
    return _subm3_impl(feats, w, nbr_idx, cdt), (feats, w, nbr_idx)


def _subm3_bwd(cdt, res, dout):
    feats, w, nbr_idx = res
    nbrT = nbr_idx.T
    wc = w.astype(cdt)
    # gd[j, u] = dout[nbr(u, k_j)] for the 26 non-center taps (zero where
    # missing).  The mirror reversal is applied to the TINY tensors (w rows
    # / dw output), never to gd — reversing the [26, V, Cout] gather output
    # materializes a full copy (~50 ms/step of reverse+copy in the train
    # profile).  Deleting the center from the 27-row stack keeps the mirror
    # pairing intact: row j of gd26 pairs with row j of _no_center(w)[::-1]
    # (tap 0 <-> w26, ..., tap 12 <-> w14, tap 14 <-> w12, ...).
    gd = pad_row(dout.astype(cdt))[_no_center(nbrT)]   # [26, V, Cout]
    d_masked = _self_mask(dout, nbrT[13], cdt)
    # dfeats[u] = sum_{k != 13} dout[nbr(u, k)] @ W[26-k]^T + dout[u] @ W13^T.
    dfeats = (jnp.einsum("kvo,kco->vc", gd, _no_center(wc)[::-1],
                         precision=_prec(cdt),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("vo,co->vc", d_masked, wc[13],
                           precision=_prec(cdt),
                           preferred_element_type=jnp.float32)
              ).astype(feats.dtype)
    # dW[26-k] = feats^T @ scattered(dout at offset 26-k) = feats^T @ gd[k];
    # the reversed 26-row einsum output lists dw slots in center-less order
    # (0..12, 14..26), so dw13 = feats^T @ masked dout is inserted at 13.
    dw26 = jnp.einsum("vc,kvo->kco", feats.astype(cdt), gd,
                      precision=_prec(cdt),
                      preferred_element_type=jnp.float32)[::-1]
    dw13 = jnp.einsum("vc,vo->co", feats.astype(cdt), d_masked,
                      precision=_prec(cdt),
                      preferred_element_type=jnp.float32)
    dw = jnp.concatenate([dw26[:13], dw13[None], dw26[13:]],
                         axis=0).astype(w.dtype)
    return dfeats, dw, _float0(nbr_idx)


_subm3.defvjp(_subm3_fwd, _subm3_bwd)


# --------------------------------------------------------------------------- #
# ks=3 binned-slot path.
#
# LiDAR voxels have few live ks3 neighbors (measured max 15/27 on KITTI-like
# scans — surfaces are thin), and the gather engine is ROW-RATE bound, so the
# dense 27-tap gather wastes most of its rows on the zero pad row.  The
# binned path gathers only the K live source rows per voxel FROM THE SMALL
# [V, C] table (gather rate collapses ~7x once the table exceeds ~0.5M rows —
# v5e locality cliff, measured; that killed the fat-product-table variant),
# then rebuilds the tap-major tensor B[v, t, c] = feats[nbr(v, t)] with a
# one-hot MXU contraction over the K slot axis.  B is bit-identical to the
# dense gather output (each (v, t) bin receives at most one row, weights are
# 0/1), so the weight einsums are unchanged — 27/K fewer gather rows at
# identical math.
#
# MEASURED SLOWER end-to-end at flagship shapes (kept as a tested option;
# default off): the V-batched [K, 27] x [K, C] binning dot runs at ~3% of
# roofline (tiny contraction dim K), B materializes as a full extra
# bandwidth pass the dense gather doesn't need, and the voxel-major B
# layout slows the weight einsum ~7x — 75 ms vs ~29 ms of dense
# gather+einsum at train-profile shapes; flagship inference 36.8 vs 38.5
# scans/s.  A gather-only microbench shows 2x, but that fuses the binning
# dot into a plain reduction, which the real conv cannot.  See ROADMAP
# "binned-slot conv"; may win on hardware with flat gather rates or a
# block-diagonal Pallas binning kernel.
#
# Backward uses the submanifold mirror symmetry the dense VJP uses
# (offsets[26-k] == -offsets[k], hence nbr(v, t) = u iff nbr(u, 26-t) = v):
# dfeats is itself a binned conv of dout through the column-reversed kernel
# with the SAME slot map, and the binned dout tensor it builds is exactly the
# per-tap-scattered dout that dW needs — one K-row gather serves both, the
# exact analogue of the dense backward's single 27-row gather.
#
# This is the rulebook row-reduction of torchsparse's CUDA conv (reference
# models/spvcnn.py:26-75 via spnn.Conv3d) without dynamic shapes; round 1's
# "hit-compacted" variant died on its variable-length segment reduce, which
# the fixed-K slot layout eliminates.
# --------------------------------------------------------------------------- #

def _binned_tap_major(x, src, tap, cdt):
    """[V, 27, C] tap-major neighbor tensor from K-slot maps.

    src: [V, K] int32 source row per live slot (sentinel V -> zero pad row).
    tap: [V, K] int32 tap id per live slot (sentinel 27 -> all-zero one-hot).
    """
    g = pad_row(x.astype(cdt))[src.T]                       # [K, V, C]
    onehot = (tap[..., None] ==
              jnp.arange(27, dtype=tap.dtype)).astype(cdt)  # [V, K, 27]
    # B[v, t, c] = sum_k onehot[v, k, t] * g[k, v, c]; exact (0/1 weights,
    # <=1 hit per bin) so cdt output loses nothing vs the dense gather.
    return jax.lax.dot_general(
        onehot, g.transpose(1, 0, 2),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=_prec(cdt), preferred_element_type=cdt)   # [V, 27, C]


def _subm3_binned_impl(feats, w, src, tap, cdt):
    b = _binned_tap_major(feats, src, tap, cdt)
    return jnp.einsum("vkc,kco->vo", b, w.astype(cdt),
                      precision=_prec(cdt),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _subm3s(feats, w, src, tap, cdt):
    # NOTE: forward/backward consistency relies on the K-slot maps being
    # LOSSLESS (tap_overflow == 0).  With overflow, the forward drops taps
    # by the destination's slot budget while the mirrored backward drops by
    # the source's — different sets, so gradients would no longer match the
    # computed forward.  The trainer warns on tap_overflow > 0; size
    # TPU.CONV_TAP_SLOTS so it never fires.
    return _subm3_binned_impl(feats, w, src, tap, cdt)


def _subm3s_fwd(feats, w, src, tap, cdt):
    return _subm3_binned_impl(feats, w, src, tap, cdt), (feats, w, src, tap)


def _subm3s_bwd(cdt, res, dout):
    feats, w, src, tap = res
    # bd[u, k, :] = dout[nbr(u, k)] — the mirrored dout, tap-major, from one
    # K-row gather.  Mirror reversal is applied to w / dw only (tiny), never
    # to bd (reversing a [V, 27, Co] tensor materializes a full copy).
    bd = _binned_tap_major(dout, src, tap, cdt)             # [V, 27, Co]
    # dfeats[u] = sum_k dout[nbr(u, k)] @ W[26-k]^T.
    dfeats = jnp.einsum("vko,kco->vc", bd, w.astype(cdt)[::-1],
                        precision=_prec(cdt),
                        preferred_element_type=jnp.float32).astype(feats.dtype)
    # dW[26-k] = feats^T @ scattered(dout at offset 26-k) = feats^T @ bd[:, k].
    dw = jnp.einsum("vc,vko->kco", feats.astype(cdt), bd,
                    precision=_prec(cdt),
                    preferred_element_type=jnp.float32)[::-1].astype(w.dtype)
    return dfeats, dw, _float0(src), _float0(tap)


_subm3s.defvjp(_subm3s_fwd, _subm3s_bwd)


# --------------------------------------------------------------------------- #
# ks=3 GROUP-POOLED slot path (host-built maps, ROADMAP r5).
#
# Per-voxel K slots waste rows on the per-voxel live-tap MAX (K=16 covers a
# p99 of 8-12); pooling the slots of the kernel's 8-voxel group rides the
# 8x tighter concentration of the group SUM (measured: max group sums
# 70-102 of 8*27 possible vs the 8*16=128 rows the K=16 layout gathers —
# 20-38% fewer gather rows, exactly lossless).  The owning voxel moves
# from layout to data: slot j of group g carries (src[g, j],
# binid[g, j] = tap*8 + voxel_in_group), built HOST-side by the loader
# (device-side compaction across voxels needs the sort/scatter per step
# that killed earlier variants).  Maps arrive pre-packed [V/8, S].
#
# Backward rides the same mirror symmetry as every other path: the binned
# dout tile bd[u, t] = dout[nbr(u, t)] comes from one S-row gather with the
# SAME maps, dfeats pairs it with the column-reversed kernel, dW with
# feats^T — see _subm3s_bwd.
# --------------------------------------------------------------------------- #

def _grouped_tap_major(x, src_pack, bin_pack, cdt):
    """[V, 27, C] tap-major neighbor tensor from group-pooled maps (XLA
    formulation; exact vs the dense gather, <= 1 hit per bin)."""
    ng, s = src_pack.shape
    c = x.shape[1]
    g = pad_row(x.astype(cdt))[src_pack]                    # [NG, S, C]
    onehot = (bin_pack[..., None] ==
              jnp.arange(216, dtype=bin_pack.dtype)).astype(cdt)
    # onehot [NG, S, 216] x g [NG, S, C], contracting S -> [NG, 216, C];
    # bins are tap-major (u = t*8 + vo), so voxel-major [V, 27, C] is one
    # reshape+transpose.
    b = jax.lax.dot_general(
        onehot, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=_prec(cdt), preferred_element_type=cdt)
    return b.reshape(ng, 27, 8, c).transpose(0, 2, 1, 3).reshape(
        ng * 8, 27, c)


def _subm3g_impl(feats, w, src_pack, bin_pack, cdt):
    b = _grouped_tap_major(feats, src_pack, bin_pack, cdt)
    return jnp.einsum("vkc,kco->vo", b, w.astype(cdt),
                      precision=_prec(cdt),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _subm3gs(feats, w, src_pack, bin_pack, cdt):
    # XLA formulation of the group-pooled conv (CPU/test fallback; the
    # Pallas kernel below is the product path).  Maps must be lossless
    # exactly like the per-voxel slot paths.
    return _subm3g_impl(feats, w, src_pack, bin_pack, cdt)


def _subm3gs_fwd(feats, w, src_pack, bin_pack, cdt):
    return (_subm3g_impl(feats, w, src_pack, bin_pack, cdt),
            (feats, w, src_pack, bin_pack))


def _subm3gs_bwd(cdt, res, dout):
    feats, w, src_pack, bin_pack = res
    bd = _grouped_tap_major(dout, src_pack, bin_pack, cdt)  # [V, 27, Co]
    dfeats = jnp.einsum("vko,kco->vc", bd, w.astype(cdt)[::-1],
                        precision=_prec(cdt),
                        preferred_element_type=jnp.float32).astype(feats.dtype)
    dw = jnp.einsum("vc,vko->kco", feats.astype(cdt), bd,
                    precision=_prec(cdt),
                    preferred_element_type=jnp.float32)[::-1].astype(w.dtype)
    return dfeats, dw, _float0(src_pack), _float0(bin_pack)


_subm3gs.defvjp(_subm3gs_fwd, _subm3gs_bwd)


def _subm3gp_impl(feats, w, src_pack, bin_pack, cdt):
    from fusiontransformer_tpu.ops.pallas.binned_conv import binned_conv_fwd
    cin, cout = w.shape[1], w.shape[2]
    g = pad_row(feats.astype(cdt))[src_pack]                # [V/8, S, C]
    return binned_conv_fwd(g, bin_pack,
                           w.astype(cdt).reshape(27 * cin, cout),
                           precise=(cdt == jnp.float32), grouped=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _subm3gp(feats, w, src_pack, bin_pack, cdt):
    return _subm3gp_impl(feats, w, src_pack, bin_pack, cdt)


def _subm3gp_fwd(feats, w, src_pack, bin_pack, cdt):
    return (_subm3gp_impl(feats, w, src_pack, bin_pack, cdt),
            (feats, w, src_pack, bin_pack))


def _subm3gp_bwd(cdt, res, dout):
    from fusiontransformer_tpu.ops.pallas.binned_conv import binned_conv_bwd
    feats, w, src_pack, bin_pack = res
    gd = pad_row(dout.astype(cdt))[src_pack]                # [V/8, S, Co]
    dx, dw = binned_conv_bwd(gd, bin_pack, feats.astype(cdt),
                             w.astype(cdt), precise=(cdt == jnp.float32),
                             grouped=True)
    return (dx.astype(feats.dtype), dw.astype(w.dtype),
            _float0(src_pack), _float0(bin_pack))


_subm3gp.defvjp(_subm3gp_fwd, _subm3gp_bwd)


# --------------------------------------------------------------------------- #
# ks=3 fused Pallas binned path (ops/pallas/binned_conv.py).
#
# Same K-slot row reduction as _subm3s, but binning + weight contraction run
# inside one Mosaic kernel so the [V, 27, C] tap-major tensor B never leaves
# VMEM — the extra HBM pass and the 3%-of-roofline [K, 27] binning dot that
# killed the XLA binned path disappear.  Backward is one fused kernel too
# (bins dout once in VMEM; emits dX via the column-reversed kernel and
# accumulates dW in VMEM scratch across the grid).  Numerics are exact vs
# the XLA binned path (0/1 one-hot weights, f32 accumulation).
# --------------------------------------------------------------------------- #

def _pack_slots_j(x):
    """[V, K] slot map -> the kernel's grouped [V/8, 8K] layout (and a
    lane-full int array in HBM: [*, 16]-minor int tiles pad to 128 lanes)."""
    v, k = x.shape
    return x.reshape(v // 8, 8 * k)


def _subm3p_impl(feats, w, src, tap, cdt):
    from fusiontransformer_tpu.ops.pallas.binned_conv import binned_conv_fwd
    cin, cout = w.shape[1], w.shape[2]
    g = pad_row(feats.astype(cdt))[_pack_slots_j(src)]     # [V/8, 8K, C]
    return binned_conv_fwd(g, _pack_slots_j(tap),
                           w.astype(cdt).reshape(27 * cin, cout),
                           precise=(cdt == jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _subm3p(feats, w, src, tap, cdt):
    # Lossless slot maps required, exactly like _subm3s (same maps).
    return _subm3p_impl(feats, w, src, tap, cdt)


def _subm3p_fwd(feats, w, src, tap, cdt):
    return _subm3p_impl(feats, w, src, tap, cdt), (feats, w, src, tap)


def _subm3p_bwd(cdt, res, dout):
    from fusiontransformer_tpu.ops.pallas.binned_conv import binned_conv_bwd
    feats, w, src, tap = res
    gd = pad_row(dout.astype(cdt))[_pack_slots_j(src)]     # [V/8, 8K, Co]
    dx, dw = binned_conv_bwd(gd, _pack_slots_j(tap), feats.astype(cdt),
                             w.astype(cdt), precise=(cdt == jnp.float32))
    return (dx.astype(feats.dtype), dw.astype(w.dtype),
            _float0(src), _float0(tap))


_subm3p.defvjp(_subm3p_fwd, _subm3p_bwd)


# Trace-time backend for the K-slot path: "xla" = _subm3s one-hot binning,
# "pallas" = _subm3p fused kernel.  Set by step/bench builders from
# cfg.TPU.CONV_PALLAS before tracing; a module global (not a call arg)
# keeps the model-layer API unchanged.
_SLOT_BACKEND = "xla"

# The fused kernel needs lane-aligned slot groups and pays lane padding on
# very narrow channels; below this Cin the dense tap-major path stays.
_PALLAS_MIN_CIN = 16
# Above 128 channels the per-block weight panel + f32 binned tile crowd
# VMEM and the kernel measured slower than dense (L3/L4 shapes,
# tools/microbench_binned_conv.py) — wide convs keep the dense path.
_PALLAS_MAX_CH = 128


def set_slot_backend(name: str):
    global _SLOT_BACKEND
    assert name in ("xla", "pallas"), name
    _SLOT_BACKEND = name


def subm_conv3(feats, w, nbr_idx, compute_dtype=jnp.bfloat16, slot_idx=None):
    """ks=3 stride=1 sparse conv.

    Args:
      feats: [V, Cin] float.
      w: [27, Cin, Cout] kernel (offset order per ops.hierarchy docstring).
      nbr_idx: [V, 27] int32 from Level.nbr_idx (sentinel V).
      slot_idx: optional (src [V, K], tap [V, K]) compact slot maps
        (Level.slot_idx); when given, both passes run a binned K-row
        gather path instead of dense 27-row gathers — the XLA one-hot
        formulation or the fused Pallas kernel per ``set_slot_backend``.
    Returns:
      [V, Cout] float32.
    """
    if slot_idx is not None:
        src, tap = slot_idx
        if src.shape[0] != feats.shape[0]:
            # Group-pooled maps [V/8, S] (host-built; tap holds bin ids).
            if _SLOT_BACKEND == "pallas" and jax.default_backend() == "tpu":
                if (feats.shape[-1] >= _PALLAS_MIN_CIN
                        and max(feats.shape[-1], w.shape[-1]) <= _PALLAS_MAX_CH
                        and feats.shape[0] % 8 == 0):
                    return _subm3gp(feats, w, src, tap, compute_dtype)
                # Wide-channel shapes keep the dense path (same routing as
                # the per-voxel maps — the XLA binned path never wins on
                # TPU).
                return _subm3(feats, w, nbr_idx, compute_dtype)
            return _subm3gs(feats, w, src, tap, compute_dtype)
        if _SLOT_BACKEND == "pallas":
            if jax.default_backend() != "tpu":
                # Product configs ship CONV_PALLAS=True; on CPU/GPU hosts
                # (tests, dryruns) the K-slot convs run the XLA one-hot
                # formulation — identical math, no Mosaic interpret mode
                # (that is a debug tool, exercised by the kernel's own
                # tests) — so the same config runs everywhere.
                return _subm3s(feats, w, src, tap, compute_dtype)
            if (feats.shape[-1] >= _PALLAS_MIN_CIN
                    and max(feats.shape[-1], w.shape[-1]) <= _PALLAS_MAX_CH
                    and feats.shape[0] % 8 == 0
                    and (8 * src.shape[1]) % 128 == 0):
                return _subm3p(feats, w, src, tap, compute_dtype)
            # Shapes the kernel measured slower on fall back to DENSE (the
            # XLA binned path is never the fastest option on v5e).
            return _subm3(feats, w, nbr_idx, compute_dtype)
        return _subm3s(feats, w, src, tap, compute_dtype)
    return _subm3(feats, w, nbr_idx, compute_dtype)


# --------------------------------------------------------------------------- #
# ks=2 stride=2 down / transposed up.
#
# The two ops are exact adjoints of each other through (child_idx,
# parent_idx, child_kidx), so each one's backward is the other's forward
# pattern — again scatter-free.  As with ks=3, gathers are tap-major and the
# GEMMs are batched einsums over the tap axis.  The (parent, slot) side is
# expressed as a narrow parent-row gather + a one-hot slot mask fused into
# the GEMM operand (``_slot8``), which both avoids gathering 8x-wide rows
# and lets dX and dW share a single gather in the backward pass.
# --------------------------------------------------------------------------- #

def _slot8(rows, kidx):
    """rows: [V, C], kidx: [V] in [0,8) -> [V, 8, C] with rows[v] at slot
    kidx[v], zeros elsewhere (fused by XLA into the consuming einsum)."""
    sel = (kidx[:, None] == jnp.arange(8, dtype=kidx.dtype)[None, :])
    return rows[:, None, :] * sel[:, :, None].astype(rows.dtype)


def _down2_impl(feats_fine, w, child_idx, cdt):
    g = pad_row(feats_fine.astype(cdt))[child_idx.T]       # [8, Vc, Cin]
    return jnp.einsum("kvc,kco->vo", g, w.astype(cdt),
                      precision=_prec(cdt),
                      preferred_element_type=jnp.float32)


def _up2_impl(feats_coarse, w, parent_idx, child_kidx, cdt):
    # out[v] = fc[parent(v)] @ W[kidx(v)]: narrow parent gather + slot mask.
    fp = pad_row(feats_coarse.astype(cdt))[parent_idx]     # [Vf, Cin]
    fp8 = _slot8(fp, child_kidx)                           # [Vf, 8, Cin]
    return jnp.einsum("vkc,kco->vo", fp8, w.astype(cdt),
                      precision=_prec(cdt),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _down2(feats_fine, w, child_idx, parent_idx, child_kidx, cdt):
    return _down2_impl(feats_fine, w, child_idx, cdt)


def _down2_fwd(feats_fine, w, child_idx, parent_idx, child_kidx, cdt):
    return (_down2_impl(feats_fine, w, child_idx, cdt),
            (feats_fine, w, child_idx, parent_idx, child_kidx))


def _down2_bwd(cdt, res, dout):
    feats_fine, w, child_idx, parent_idx, child_kidx = res
    # Shared gather: p8[u, k] = dout[parent(u)] at slot k_u, zeros elsewhere.
    p = pad_row(dout.astype(cdt))[parent_idx]              # [Vf, Cout]
    p8 = _slot8(p, child_kidx)                             # [Vf, 8, Cout]
    # dX[u] = dout[parent(u)] @ W[k_u]^T.
    dx = jnp.einsum("vko,kco->vc", p8, w.astype(cdt),
                    precision=_prec(cdt),
                    preferred_element_type=jnp.float32).astype(feats_fine.dtype)
    # dW[k] = sum_u feats[u] (x) p8[u, k].
    dw = jnp.einsum("vc,vko->kco", feats_fine.astype(cdt), p8,
                    precision=_prec(cdt),
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw, _float0(child_idx), _float0(parent_idx), _float0(child_kidx)


_down2.defvjp(_down2_fwd, _down2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _up2(feats_coarse, w, parent_idx, child_kidx, child_idx, cdt):
    return _up2_impl(feats_coarse, w, parent_idx, child_kidx, cdt)


def _up2_fwd(feats_coarse, w, parent_idx, child_kidx, child_idx, cdt):
    return (_up2_impl(feats_coarse, w, parent_idx, child_kidx, cdt),
            (feats_coarse, w, parent_idx, child_kidx, child_idx))


def _up2_bwd(cdt, res, dout):
    feats_coarse, w, parent_idx, child_kidx, child_idx = res
    gd = pad_row(dout.astype(cdt))[child_idx.T]            # [8, Vc, Cout]
    # dX[p] = sum_k dout[child_idx[p, k]] @ W[k]^T.
    dx = jnp.einsum("kvo,kco->vc", gd, w.astype(cdt),
                    precision=_prec(cdt),
                    preferred_element_type=jnp.float32).astype(
        feats_coarse.dtype)
    # dW[k] = X^T @ (dout gathered at slot k).
    dw = jnp.einsum("vc,kvo->kco", feats_coarse.astype(cdt), gd,
                    precision=_prec(cdt),
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw, _float0(parent_idx), _float0(child_kidx), _float0(child_idx)


_up2.defvjp(_up2_fwd, _up2_bwd)


def down_conv2(feats_fine, w, child_idx, parent_idx=None, child_kidx=None,
               compute_dtype=jnp.bfloat16):
    """ks=2 stride=2 sparse conv (downsample).

    Args:
      feats_fine: [Vf, Cin] at level l.
      w: [8, Cin, Cout].
      child_idx: [Vc, 8] int32 from Level(l+1).child_idx (sentinel Vf).
      parent_idx/child_kidx: level-l maps; when provided, the scatter-free
        custom VJP is used (omit only for inference-only call sites).
    Returns:
      [Vc, Cout] float32 at level l+1.
    """
    if parent_idx is None or child_kidx is None:
        return _down2_impl(feats_fine, w, child_idx, compute_dtype)
    return _down2(feats_fine, w, child_idx, parent_idx, child_kidx,
                  compute_dtype)


def up_conv2(feats_coarse, w, parent_idx, child_kidx, child_idx=None,
             compute_dtype=jnp.bfloat16):
    """ks=2 stride=2 transposed sparse conv (upsample).

    Output coords are the (precomputed) fine-level coord set, exactly like
    torchsparse's cached coord_maps guarantee in the reference UNet
    (``models/spvcnn.py:128-162``).

    Args:
      feats_coarse: [Vc, Cin] at level l+1.
      w: [8, Cin, Cout].
      parent_idx: [Vf] int32 into level l+1 (sentinel Vc).
      child_kidx: [Vf] int32 in [0, 8).
      child_idx: [Vc, 8] map for the scatter-free custom VJP (optional).
    Returns:
      [Vf, Cout] float32 at level l.
    """
    if child_idx is None:
        return _up2_impl(feats_coarse, w, parent_idx, child_kidx,
                         compute_dtype)
    return _up2(feats_coarse, w, parent_idx, child_kidx, child_idx,
                compute_dtype)


def conv1x1(feats, w, compute_dtype=jnp.bfloat16):
    """ks=1 sparse conv = per-voxel linear map."""
    return jnp.dot(feats.astype(compute_dtype), w.astype(compute_dtype),
                   precision=_prec(compute_dtype),
                   preferred_element_type=jnp.float32)


def voxelize_mean(pt_feats, pt_voxel_idx, pt_valid, num_voxels, plan=None,
                  compute_dtype=jnp.bfloat16):
    """Average-pool point features into their containing voxels.

    Matches ``spf.spvoxelize`` + ``spcount`` semantics (mean, reference
    ``models/utils.py:19-27``).  Sentinel indices land in a dropped overflow
    segment.  With a DevoxPlan the feature sum runs through the Pallas
    sorted-segment kernel instead of an XLA scatter; ``compute_dtype`` f32
    keeps the kernel's per-point contributions un-rounded (true f32 parity).
    """
    ids = jnp.where(pt_valid, pt_voxel_idx, num_voxels)
    if plan is None:
        counts = jax.ops.segment_sum(
            pt_valid.astype(jnp.float32), ids,
            num_segments=num_voxels + 1)[:num_voxels]
        inv = 1.0 / jnp.maximum(counts, 1.0)
        sums = jax.ops.segment_sum(
            pt_feats * pt_valid[:, None].astype(pt_feats.dtype), ids,
            num_segments=num_voxels + 1)[:num_voxels]
        return sums * inv[:, None]
    # Plan path: counts ride the same Pallas kernel call as a trailing ones
    # column of the value matrix (T = [sum valid*feats, sum valid]) — the
    # standalone counts segment_sum was the last XLA row scatter left in the
    # hot step (~1.4 ms/step at bench shapes).
    out = _voxmean_sum(pt_feats, pt_valid, ids, plan.sort_perm,
                       plan.ids_sorted, num_voxels,
                       compute_dtype == jnp.float32)
    sums, counts = out[:, :-1], jax.lax.stop_gradient(out[:, -1])
    inv = 1.0 / jnp.maximum(counts, 1.0)
    return sums * inv[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _voxmean_sum(pt_feats, pt_valid, ids_orig, sort_perm, ids_sorted,
                 num_voxels, precise):
    return _voxmean_sum_impl(pt_feats, pt_valid, sort_perm, ids_sorted,
                             num_voxels, precise)


def _voxmean_sum_impl(pt_feats, pt_valid, sort_perm, ids_sorted, num_voxels,
                      precise):
    """Returns [V, C+1]: feature sums plus a trailing point-count column."""
    from fusiontransformer_tpu.ops.pallas.segment_sum import (
        sorted_segment_weighted_sum)

    ones = jnp.ones((pt_feats.shape[0], 1), jnp.float32)
    g_s = pad_row(jnp.concatenate(
        [pt_feats.astype(jnp.float32), ones], axis=1))[sort_perm]
    w_s = pad_row(pt_valid.astype(jnp.float32)[:, None])[sort_perm]
    # Unreached rows come back zeroed (kernel contract) — NaN-safe for the
    # masked BN that consumes this.
    return sorted_segment_weighted_sum(g_s, w_s, ids_sorted, num_voxels,
                                       precise=precise)


def _voxmean_sum_fwd(pt_feats, pt_valid, ids_orig, sort_perm, ids_sorted,
                     num_voxels, precise):
    out = _voxmean_sum_impl(pt_feats, pt_valid, sort_perm, ids_sorted,
                            num_voxels, precise)
    return out, (pt_feats, pt_valid, ids_orig, sort_perm, ids_sorted)


def _voxmean_sum_bwd(num_voxels, precise, res, dout):
    pt_feats, pt_valid, ids_orig, sort_perm, ids_sorted = res
    # Adjoint of the masked segment-sum is a plain gather in original point
    # order: d pt_feats[n] = valid[n] * dout[vox(n)].  The trailing counts
    # column is stop_gradient'd by the caller (zero cotangent) and the ones
    # column it sums is constant — slice it off.
    dpt = pad_row(dout[:, :-1])[jnp.minimum(ids_orig, num_voxels)]
    dpt = dpt * pt_valid[:, None].astype(dpt.dtype)
    return (dpt.astype(pt_feats.dtype), _float0(pt_valid), _float0(ids_orig),
            _float0(sort_perm), _float0(ids_sorted))


_voxmean_sum.defvjp(_voxmean_sum_fwd, _voxmean_sum_bwd)


def _devox_impl(vox_feats, corner_idx, corner_w, precise=False):
    fe = pad_row(vox_feats)
    g = fe[corner_idx.T]                              # [8, N, C] tap-major
    # Returns f32 (docstring contract) even for bf16 voxel features; the
    # f32 parity path needs HIGHEST like every other conv site (_prec) —
    # TPU's default matmul precision is a single bf16 pass.
    return jnp.einsum("nk,knc->nc", corner_w.astype(g.dtype), g,
                      precision=jax.lax.Precision.HIGHEST if precise
                      else None,
                      preferred_element_type=jnp.float32)


class DevoxPlan(NamedTuple):
    """Index maps for the scatter-free devoxelize adjoint (see
    ``ops.pallas.segment_sum``): the adjoint scatter
    ``dvox[corner_idx[n,e]] += w[n,e] dout[n]`` becomes a sorted-segment
    reduction over the Morton-ordered point stream plus 8 mirror gathers
    ``dvox[u] = sum_e T[e][nbr(u, -e)]``."""

    sort_perm: jnp.ndarray   # [N] original point index per sorted slot
    ids_sorted: jnp.ndarray  # [N] level voxel id per sorted slot (sentinel V)
    nbr_neg: jnp.ndarray     # [V, 8] ks3-map columns at taps -e (sentinel V)


# tap index of offset -e for corner e=(bx,by,bz), our x-slowest ks3 order.
_NEG_CORNER_TAPS = np.array(
    [(1 - bx) * 9 + (1 - by) * 3 + (1 - bz)
     for bx in (0, 1) for by in (0, 1) for bz in (0, 1)], np.int32)


def devox_plan(hier, level):
    """Build the DevoxPlan for ``hier.levels[level]`` (a few tiny gathers)."""
    lvl = hier.levels[level]
    cap = lvl.valid.shape[0]
    ids = hier.pt_voxel_idx[level]                   # original point order
    ids_sorted = jnp.concatenate(
        [ids, jnp.full((1,), cap, ids.dtype)])[hier.vox0_point_idx]
    nbr_neg = lvl.nbr_idx[:, _NEG_CORNER_TAPS]
    return DevoxPlan(hier.vox0_point_idx, ids_sorted, nbr_neg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _devox3(vox_feats, corner_idx, corner_w, sort_perm, ids_sorted, nbr_neg,
            precise):
    return _devox_impl(vox_feats, corner_idx, corner_w, precise)


def _devox3_fwd(vox_feats, corner_idx, corner_w, sort_perm, ids_sorted,
                nbr_neg, precise):
    return (_devox_impl(vox_feats, corner_idx, corner_w, precise),
            (vox_feats, corner_idx, corner_w, sort_perm, ids_sorted, nbr_neg))


def _devox3_bwd(precise, res, dout):
    from fusiontransformer_tpu.ops.pallas.segment_sum import (
        sorted_segment_weighted_sum)

    vox_feats, corner_idx, corner_w, sort_perm, ids_sorted, nbr_neg = res
    V, C = vox_feats.shape
    dout = dout.astype(jnp.float32)
    # Per-corner tables over the sorted point stream (Pallas, scatter-free).
    g_s = pad_row(dout)[sort_perm]
    w_s = pad_row(corner_w.astype(jnp.float32))[sort_perm]
    T = sorted_segment_weighted_sum(g_s, w_s, ids_sorted, V,
                                    precise=precise)   # [V, 8C]
    # Mirror gathers: dvox[u] = sum_e T[nbr(u,-e), eC:(e+1)C].  One flat
    # gather of 8 C-wide rows per voxel; sentinel neighbors masked to zero
    # (their T rows are unwritten).
    T2 = T.reshape(V * 8, C)
    flat = jnp.minimum(nbr_neg, V - 1) * 8 + jnp.arange(8, dtype=jnp.int32)
    g8 = T2[flat]                                              # [V, 8, C]
    g8 = jnp.where((nbr_neg < V)[:, :, None], g8, 0.0)
    dvox = jnp.sum(g8, axis=1).astype(vox_feats.dtype)
    # d(corner_w) — exact, but dead (corner weights come from int coords)
    # so XLA removes it from the train step.
    fe = pad_row(vox_feats)
    dw = jnp.einsum("knc,nc->nk", fe[corner_idx.T].astype(jnp.float32),
                    dout).astype(corner_w.dtype)
    zi = _float0(corner_idx)
    return (dvox, zi, dw, _float0(res[3]), _float0(res[4]), _float0(res[5]))


_devox3.defvjp(_devox3_fwd, _devox3_bwd)


def devoxelize_trilinear(vox_feats, corner_idx, corner_w, plan=None,
                         compute_dtype=jnp.bfloat16):
    """Trilinear voxel->point interpolation (``spdevoxelize`` equivalent).

    Args:
      vox_feats: [V, C].
      corner_idx: [N, 8] int32 (sentinel V -> zero contribution).
      corner_w: [N, 8] float32 (already zeroed at missing corners, matching
        ``calc_ti_weights``; no renormalization).
      plan: optional DevoxPlan; when given, the backward pass runs the
        scatter-free Pallas sorted-segment kernel (~10x faster than XLA's
        autodiff scatter on v5e) instead of autodiff.  ``compute_dtype`` f32
        keeps the kernel's contributions un-rounded (true f32 parity).
    Returns:
      [N, C] float32.
    """
    if plan is None:
        return _devox_impl(vox_feats, corner_idx, corner_w,
                           compute_dtype == jnp.float32)
    return _devox3(vox_feats, corner_idx, corner_w,
                   plan.sort_perm, plan.ids_sorted, plan.nbr_neg,
                   compute_dtype == jnp.float32)


def gather_rows(feats, idx):
    """Gather with a zero pad row (sentinel index = len(feats))."""
    return pad_row(feats)[idx]
