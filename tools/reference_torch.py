"""Faithful torch-CPU re-implementation of the reference model families.

Purpose (VERDICT r2 "Next round #1"): full-model logit parity with SHARED
weights.  Every module here is named so that ``model.state_dict()`` has
EXACTLY the reference's checkpoint key layout (``backbone.stem.0.kernel``,
``lidar_backbone.up1.0.net.0.kernel``, ``image_backbone.backbone.blocks.3.
attn.qkv.weight``, ...).  A state_dict produced by (or loaded into) these
models can be pushed through ``fusiontransformer_tpu.utils.torch_convert``
into the JAX models, and the two forwards diffed logit-by-logit.

The sparse machinery re-implements torchsparse v1.1.0 *behavior* (hash-query
kernel maps, gather-GEMM-scatter convs, trilinear devoxelize) with numpy
joins — torchsparse itself needs CUDA and is not installable here.  Graph
citations:

* SPVCNN blocks/forward:  reference ``models/spvcnn.py:22-233``
* point<->voxel ops:      reference ``models/utils.py:15-106``
* fusion variants:        reference ``models/{early,middle,late}_fusion.py``
* image stream:           reference ``models/image_models_billinear.py``
* DeiT forward_blocks:    reference ``models/transformers.py:16-45`` (timm
  0.4.9 VisionTransformer semantics: pre-norm blocks, fused qkv, exact GELU,
  LayerNorm eps 1e-6, tokens [cls, dist, patches], pos_embed added after
  concat)

Two torchsparse conventions cannot be verified in this environment (no
torchsparse source available, zero egress) and are encoded as module
constants, both matching the round-2 analysis in ROADMAP.md / the
``KS3_PERM`` tables in ``utils/torch_convert.py``:

* ``TAP_X_FASTEST = True``: KernelRegion enumerates offsets x-fastest
  (``x_offset = single_offset * k**2`` — list repetition, so x cycles with
  period k).  The trilinear corner-weight order below follows the SAME
  enumeration, which is forced: torchsparse uses one KernelRegion for both
  conv taps and devoxelize corners, so they cannot disagree.
* ``TI_RENORM = True``: ``calc_ti_weights`` ends with
  ``w /= w.sum(0) + 1e-8`` — weights of present corners are renormalized to
  sum to 1 (interpolation over the present corners only).  This matters for
  surface voxels whose corner neighborhoods are partially empty — i.e. most
  LiDAR voxels at coarse strides.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

TAP_X_FASTEST = True
TI_RENORM = True

CS = [32, 32, 64, 128, 256, 256, 128, 96, 96]   # models/spvcnn.py:87


# --------------------------------------------------------------------------- #
# torchsparse-equivalent functional layer (numpy joins instead of GPU hashes)
# --------------------------------------------------------------------------- #


def _offsets3():
    """ks=3 offsets in KernelRegion order (x fastest when TAP_X_FASTEST)."""
    if TAP_X_FASTEST:
        return [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)]
    return [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


def _offsets2():
    """ks=2 offsets {0,1}^3 in KernelRegion order."""
    if TAP_X_FASTEST:
        return [(bx, by, bz) for bz in (0, 1) for by in (0, 1)
                for bx in (0, 1)]
    return [(bx, by, bz) for bx in (0, 1) for by in (0, 1) for bz in (0, 1)]


def _pack(c):
    """Sortable int64 key for [N, 4] (x, y, z, batch) int coords.

    Stands in for spf.sphash; coords must be in [0, 2^19)."""
    c = np.asarray(c, np.int64)
    return (c[:, 3] << 60) | (c[:, 0] << 40) | (c[:, 1] << 20) | c[:, 2]


class _Table:
    """Sorted-key lookup table over a coord set (sphashquery equivalent)."""

    def __init__(self, coords4):
        self.coords = np.asarray(coords4, np.int64)
        keys = _pack(self.coords)
        self.perm = np.argsort(keys, kind="stable")
        self.sorted_keys = keys[self.perm]

    def query(self, q_coords4):
        """Row index for each query coord, -1 when absent or out of range."""
        q = np.asarray(q_coords4, np.int64)
        in_range = (q[:, :3] >= 0).all(1) & (q[:, :3] < (1 << 19)).all(1)
        keys = _pack(np.clip(q, 0, (1 << 19) - 1))
        pos = np.searchsorted(self.sorted_keys, keys)
        pos = np.clip(pos, 0, len(self.sorted_keys) - 1)
        hit = (self.sorted_keys[pos] == keys) & in_range
        return np.where(hit, self.perm[pos], -1)


class SparseTensorRef:
    """Minimal torchsparse.SparseTensor: feats + int coords + stride + caches."""

    def __init__(self, feats, coords4, stride=1):
        self.F = feats                              # torch [V, C]
        self.C = np.asarray(coords4, np.int64)      # [V, 4] (x, y, z, b)
        self.s = stride
        self.kernel_maps = {}                       # shared down<->up caches
        self.table = _Table(self.C)

    def like(self, feats):
        t = SparseTensorRef.__new__(SparseTensorRef)
        t.F, t.C, t.s = feats, self.C, self.s
        t.kernel_maps, t.table = self.kernel_maps, self.table
        return t


class PointTensorRef:
    """Minimal torchsparse.PointTensor (float coords + per-stride caches)."""

    def __init__(self, feats, coords4_float):
        self.F = feats
        self.C = np.asarray(coords4_float, np.float64)
        self.idx_query = {}      # voxel_to_point caches, keyed by stride
        self.weights = {}
        self.additional = {}     # point_to_voxel caches, keyed by stride


def initial_voxelize(z: PointTensorRef) -> SparseTensorRef:
    """reference ``models/utils.py:15-35`` with pres == vres == 1."""
    fl = np.floor(z.C).astype(np.int64)
    keys = _pack(fl)
    uniq_keys, idx_query, counts = np.unique(keys, return_inverse=True,
                                             return_counts=True)
    nvox = len(uniq_keys)
    coords = np.zeros((nvox, 4), np.int64)
    # spvoxelize(floor(coords)) averages int coords per voxel -> the coords
    # themselves (all points in a voxel share the floored coord).
    coords[idx_query] = fl
    feats = torch.zeros(nvox, z.F.shape[1], dtype=z.F.dtype)
    feats.index_add_(0, torch.from_numpy(idx_query), z.F)
    feats = feats / torch.from_numpy(counts.astype(np.float32)).view(-1, 1)
    z.additional[1] = (idx_query, counts)
    return SparseTensorRef(feats, coords, stride=1)


def point_to_voxel(x: SparseTensorRef, z: PointTensorRef) -> SparseTensorRef:
    """reference ``models/utils.py:40-63``: average-pool points into x's rows."""
    if x.s not in z.additional:
        pc = np.concatenate(
            [np.floor(z.C[:, :3] / x.s).astype(np.int64) * x.s,
             z.C[:, 3:].astype(np.int64)], 1)
        idx_query = x.table.query(pc)
        counts = np.bincount(idx_query[idx_query >= 0],
                             minlength=x.C.shape[0])
        z.additional[x.s] = (idx_query, counts)
    idx_query, counts = z.additional[x.s]
    feats = torch.zeros(x.C.shape[0], z.F.shape[1], dtype=z.F.dtype)
    m = idx_query >= 0
    feats.index_add_(0, torch.from_numpy(idx_query[m]), z.F[torch.from_numpy(m)])
    feats = feats / torch.from_numpy(
        np.maximum(counts, 1).astype(np.float32)).view(-1, 1)
    return x.like(feats)


def calc_ti_weights(pc, idx_query, scale):
    """Trilinear corner weights (torchsparse ``calc_ti_weights`` semantics).

    pc: [N, 4] float point coords; idx_query: [8, N]; returns [8, N] f32.
    Corner order follows ``_offsets2()`` (must match the ``old_hash`` offset
    enumeration in ``voxel_to_point``).
    """
    p = pc[:, :3].astype(np.float64)
    pf = np.floor(p / scale) * scale
    frac = (p - pf) / scale                          # [N, 3] in [0, 1)
    ws = []
    for (bx, by, bz) in _offsets2():
        wx = frac[:, 0] if bx else 1.0 - frac[:, 0]
        wy = frac[:, 1] if by else 1.0 - frac[:, 1]
        wz = frac[:, 2] if bz else 1.0 - frac[:, 2]
        ws.append(wx * wy * wz)
    w = np.stack(ws, 0).astype(np.float32)           # [8, N]
    w[idx_query == -1] = 0.0
    if TI_RENORM:
        w = w / (w.sum(0, keepdims=True) + 1e-8)
    return w


def voxel_to_point(x: SparseTensorRef, z: PointTensorRef) -> torch.Tensor:
    """reference ``models/utils.py:68-106`` (nearest=False branch)."""
    if x.s not in z.idx_query:
        base = np.concatenate(
            [np.floor(z.C[:, :3] / x.s).astype(np.int64) * x.s,
             z.C[:, 3:].astype(np.int64)], 1)
        rows = []
        for (bx, by, bz) in _offsets2():
            q = base.copy()
            q[:, 0] += bx * x.s
            q[:, 1] += by * x.s
            q[:, 2] += bz * x.s
            rows.append(x.table.query(q))
        idx_query = np.stack(rows, 0)                # [8, N]
        z.idx_query[x.s] = idx_query
        z.weights[x.s] = calc_ti_weights(z.C, idx_query, x.s)
    idx_query, w = z.idx_query[x.s], z.weights[x.s]
    out = torch.zeros(z.C.shape[0], x.F.shape[1], dtype=x.F.dtype)
    for k in range(8):
        m = idx_query[k] >= 0
        if m.any():
            out[torch.from_numpy(m)] += (
                x.F[torch.from_numpy(idx_query[k][m])]
                * torch.from_numpy(w[k][m]).view(-1, 1))
    return out


# --------------------------------------------------------------------------- #
# spnn-equivalent modules (state_dict parameter names match torchsparse)
# --------------------------------------------------------------------------- #


class Conv3dRef(nn.Module):
    """spnn.Conv3d: kernel [k^3, Cin, Cout] ([Cin, Cout] when ks == 1)."""

    def __init__(self, inc, outc, kernel_size=3, stride=1, transpose=False):
        super().__init__()
        self.inc, self.outc = inc, outc
        self.ks, self.stride, self.transpose = kernel_size, stride, transpose
        kv = kernel_size ** 3
        shape = (inc, outc) if kv == 1 else (kv, inc, outc)
        std = 1.0 / np.sqrt(inc * kv)
        self.kernel = nn.Parameter(torch.empty(*shape).uniform_(-std, std))

    def forward(self, x: SparseTensorRef) -> SparseTensorRef:
        if self.ks == 1:
            return x.like(x.F @ self.kernel)
        if self.ks == 3 and self.stride == 1:
            return self._subm(x)
        assert self.ks == 2 and self.stride == 2
        return self._up(x) if self.transpose else self._down(x)

    def _subm(self, x):
        key = ("subm3", x.s)
        if key not in x.kernel_maps:
            rows = []
            for (dx, dy, dz) in _offsets3():
                q = x.C.copy()
                q[:, 0] += dx * x.s
                q[:, 1] += dy * x.s
                q[:, 2] += dz * x.s
                rows.append(x.table.query(q))
            x.kernel_maps[key] = np.stack(rows, 0)   # [27, V]
        maps = x.kernel_maps[key]
        out = torch.zeros(x.C.shape[0], self.outc, dtype=x.F.dtype)
        for k in range(27):
            m = maps[k] >= 0
            if m.any():
                out[torch.from_numpy(m)] += (
                    x.F[torch.from_numpy(maps[k][m])] @ self.kernel[k])
        return x.like(out)

    def _down(self, x):
        new_s = x.s * 2
        coarse = np.concatenate(
            [np.floor(x.C[:, :3] / new_s).astype(np.int64) * new_s,
             x.C[:, 3:]], 1)
        uniq, first = np.unique(_pack(coarse), return_index=True)
        out_coords = coarse[first]                   # sorted by packed key
        out = SparseTensorRef(None, out_coords, stride=new_s)
        rows = []
        for (bx, by, bz) in _offsets2():
            q = out_coords.copy()
            q[:, 0] += bx * x.s
            q[:, 1] += by * x.s
            q[:, 2] += bz * x.s
            rows.append(x.table.query(q))
        maps = np.stack(rows, 0)                     # [8, Vcoarse]
        feats = torch.zeros(out_coords.shape[0], self.outc, dtype=x.F.dtype)
        for k in range(8):
            m = maps[k] >= 0
            if m.any():
                feats[torch.from_numpy(m)] += (
                    x.F[torch.from_numpy(maps[k][m])] @ self.kernel[k])
        out.F = feats
        # Cache the (fine coords, map) pair for the mirrored transpose conv,
        # like torchsparse's kernel_maps (reference models/spvcnn.py up path).
        out.kernel_maps = dict(x.kernel_maps)
        out.kernel_maps[("down", new_s)] = (x.C, maps, x.table)
        return out

    def _up(self, x):
        fine_coords, maps, fine_table = x.kernel_maps[("down", x.s)]
        feats = torch.zeros(fine_coords.shape[0], self.outc, dtype=x.F.dtype)
        for k in range(8):
            m = maps[k] >= 0
            if m.any():
                feats[torch.from_numpy(maps[k][m])] += (
                    x.F[torch.from_numpy(m)] @ self.kernel[k])
        out = SparseTensorRef.__new__(SparseTensorRef)
        out.F, out.C, out.s = feats, fine_coords, x.s // 2
        out.kernel_maps = dict(x.kernel_maps)
        out.table = fine_table
        return out


class BatchNormRef(nn.BatchNorm1d):
    """spnn.BatchNorm: BatchNorm1d over the voxel rows."""

    def forward(self, x: SparseTensorRef) -> SparseTensorRef:
        return x.like(super().forward(x.F))


class ReLURef(nn.ReLU):
    def forward(self, x: SparseTensorRef) -> SparseTensorRef:
        return x.like(super().forward(x.F))


def sparse_cat(a: SparseTensorRef, b: SparseTensorRef) -> SparseTensorRef:
    return a.like(torch.cat([a.F, b.F], 1))


class BasicConvolutionBlock(nn.Module):
    """reference ``models/spvcnn.py:22-35``."""

    def __init__(self, inc, outc, ks=3, stride=1):
        super().__init__()
        self.net = nn.Sequential(Conv3dRef(inc, outc, ks, stride),
                                 BatchNormRef(outc), ReLURef(True))

    def forward(self, x):
        return self.net(x)


class BasicDeconvolutionBlock(nn.Module):
    """reference ``models/spvcnn.py:38-49``."""

    def __init__(self, inc, outc, ks=2, stride=2):
        super().__init__()
        self.net = nn.Sequential(Conv3dRef(inc, outc, ks, stride,
                                           transpose=True),
                                 BatchNormRef(outc), ReLURef(True))

    def forward(self, x):
        return self.net(x)


class ResidualBlock(nn.Module):
    """reference ``models/spvcnn.py:53-79`` (stride always 1 in SPVCNN)."""

    def __init__(self, inc, outc, ks=3, stride=1):
        super().__init__()
        self.net = nn.Sequential(
            Conv3dRef(inc, outc, ks, stride), BatchNormRef(outc),
            ReLURef(True),
            Conv3dRef(outc, outc, ks, 1), BatchNormRef(outc))
        self.downsample = nn.Sequential() if (inc == outc and stride == 1) \
            else nn.Sequential(Conv3dRef(inc, outc, 1, 1), BatchNormRef(outc))
        self.relu = ReLURef(True)

    def forward(self, x):
        h = self.net(x)
        s = self.downsample(x) if len(self.downsample) else x
        return self.relu(h.like(h.F + s.F))


class SPVCNNRef(nn.Module):
    """reference ``models/spvcnn.py:82-233`` — module names match exactly."""

    def __init__(self, in_channels=4, cr=1.0, num_blocks_fusion=None):
        super().__init__()
        cs = [int(cr * c) for c in CS]
        self.cs = cs
        self.stem = nn.Sequential(
            Conv3dRef(in_channels, cs[0], 3, 1), BatchNormRef(cs[0]),
            ReLURef(True),
            Conv3dRef(cs[0], cs[0], 3, 1), BatchNormRef(cs[0]), ReLURef(True))
        for i, (ci, co) in enumerate(zip([cs[0], cs[1], cs[2], cs[3]],
                                         [cs[1], cs[2], cs[3], cs[4]]),
                                     start=1):
            setattr(self, f"stage{i}", nn.Sequential(
                BasicConvolutionBlock(ci, ci, ks=2, stride=2),
                ResidualBlock(ci, co), ResidualBlock(co, co)))
        up_specs = [(cs[4], cs[5], cs[3]), (cs[5], cs[6], cs[2]),
                    (cs[6], cs[7], cs[1]), (cs[7], cs[8], cs[0])]
        for j, (din, dout, skip) in enumerate(up_specs, start=1):
            setattr(self, f"up{j}", nn.ModuleList([
                BasicDeconvolutionBlock(din, dout, ks=2, stride=2),
                nn.Sequential(ResidualBlock(dout + skip, dout),
                              ResidualBlock(dout, dout))]))
        self.point_transforms = nn.ModuleList([
            nn.Sequential(nn.Linear(cs[0], cs[4]), nn.BatchNorm1d(cs[4]),
                          nn.ReLU(True)),
            nn.Sequential(nn.Linear(cs[4], cs[6]), nn.BatchNorm1d(cs[6]),
                          nn.ReLU(True)),
            nn.Sequential(nn.Linear(cs[6], cs[8]), nn.BatchNorm1d(cs[8]),
                          nn.ReLU(True))])
        self.dropout = nn.Dropout(0.3, True)

    def forward(self, x: SparseTensorRef, early_feats=None, middle_feats=None,
                early_transform=None, middle_transform=None):
        """The shared backbone graph; fusion hooks mirror Net3DSeg variants
        (reference ``middle_fusion.py:32-74`` / ``early_fusion.py:31-73``)."""
        z = PointTensorRef(x.F, x.C.astype(np.float64))

        x0 = initial_voxelize(z)
        x0 = self.stem(x0)
        z0f = voxel_to_point(x0, z)
        if early_feats is not None:
            z0f = z0f + early_transform(early_feats)
        z0 = PointTensorRef(z0f, z.C)
        z0.additional = z.additional

        x1 = point_to_voxel(x0, z0)
        x1 = self.stage1(x1)
        x2 = self.stage2(x1)
        x3 = self.stage3(x2)
        x4 = self.stage4(x3)
        z1f = voxel_to_point(x4, z0) + self.point_transforms[0](z0.F)
        if middle_feats is not None:
            z1f = z1f + middle_transform(middle_feats)
        z1 = PointTensorRef(z1f, z.C)
        z1.additional = z0.additional
        z1.idx_query, z1.weights = z0.idx_query, z0.weights

        y1 = point_to_voxel(x4, z1)
        y1.F = self.dropout(y1.F)
        y1 = self.up1[0](y1)
        y1 = sparse_cat(y1, x3)
        y1 = self.up1[1](y1)

        y2 = self.up2[0](y1)
        y2 = sparse_cat(y2, x2)
        y2 = self.up2[1](y2)
        z2f = voxel_to_point(y2, z1) + self.point_transforms[1](z1.F)
        z2 = PointTensorRef(z2f, z.C)
        z2.additional = z1.additional
        z2.idx_query, z2.weights = z1.idx_query, z1.weights

        y3 = point_to_voxel(y2, z2)
        y3.F = self.dropout(y3.F)
        y3 = self.up3[0](y3)
        y3 = sparse_cat(y3, x1)
        y3 = self.up3[1](y3)

        y4 = self.up4[0](y3)
        y4 = sparse_cat(y4, x0)
        y4 = self.up4[1](y4)
        z3 = voxel_to_point(y4, z2) + self.point_transforms[2](z2.F)
        return z3


# --------------------------------------------------------------------------- #
# timm-0.4.9-semantics DeiT + Net2DBillinear
# --------------------------------------------------------------------------- #


class _PatchEmbed(nn.Module):
    def __init__(self, d, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, d, patch, patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _Attention(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.num_heads = h
        self.scale = (d // h) ** -0.5
        self.qkv = nn.Linear(d, 3 * d, bias=True)
        self.proj = nn.Linear(d, d)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _Mlp(nn.Module):
    def __init__(self, d, hidden):
        super().__init__()
        self.fc1 = nn.Linear(d, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, d)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = _Attention(d, h)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = _Mlp(d, 4 * d)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class VisionTransformerRef(nn.Module):
    """DeiT-distilled with forward_blocks (reference transformers.py:16-45)."""

    def __init__(self, img_size=384, patch=16, d=768, depth=12, heads=12):
        super().__init__()
        n = (img_size // patch) ** 2
        self.patch_embed = _PatchEmbed(d, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.dist_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 2, d))
        self.blocks = nn.ModuleList([_Block(d, heads) for _ in range(depth)])

    def forward_blocks(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        dist = self.dist_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, dist, x), dim=1)
        x = x + self.pos_embed
        outputs = {}
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            outputs[str(i)] = x[:, 2:, :]            # strip cls/dist tokens
        return outputs


class BilinearModuleRef(nn.Module):
    """reference ``image_models_billinear.py:8-23`` — NOTE conv -> ReLU -> BN
    order and nn.Upsample's DEFAULT mode, which is NEAREST."""

    def __init__(self, inf, outf, size):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(inf, outf, 1), nn.ReLU(True),
                                  nn.BatchNorm2d(outf))
        self.up = nn.Upsample(size)

    def forward(self, x):
        return self.up(self.stem(x))


class Net2DBillinearRef(nn.Module):
    """reference ``image_models_billinear.py:26-158``."""

    def __init__(self, num_classes, dual_head, middle_block=None,
                 late_block=11, img_hw=(370, 1226), vit_kw=None):
        super().__init__()
        vit_kw = vit_kw or {}
        d = vit_kw.get("d", 768)
        self.vit_size = vit_kw.get("img_size", 384)
        self.patch = vit_kw.get("patch", 16)
        self.sample_down = BilinearModuleRef(3, 3, (self.vit_size,
                                                    self.vit_size))
        self.backbone = VisionTransformerRef(**vit_kw)
        self.middle_block = (str(middle_block) if middle_block is not None
                             else None)
        self.late_block = str(late_block)
        self.up = nn.ModuleDict()
        if self.middle_block and self.middle_block != self.late_block:
            self.up[self.middle_block] = BilinearModuleRef(d, 96, img_hw)
        self.up[self.late_block] = BilinearModuleRef(d, 96, img_hw)
        self.linear = nn.Linear(96, num_classes)
        self.dual_head = dual_head
        if dual_head:
            self.linear2 = nn.Linear(96, num_classes)

    def get_img_feats(self, img_indices, block_id, out):
        x = out[block_id]
        B, N, D = x.shape
        g = self.vit_size // self.patch
        x = x.transpose(1, 2).reshape(B, D, g, g)
        x = self.up[block_id](x)
        feats = []
        for i in range(B):
            ii = img_indices[i]
            feats.append(x.permute(0, 2, 3, 1)[i][ii[:, 0], ii[:, 1]])
        return torch.cat(feats, 0)

    def forward(self, img, img_indices):
        x = self.sample_down(img)
        out = self.backbone.forward_blocks(x)
        late = self.get_img_feats(img_indices, self.late_block, out)
        preds = {"img_feats": late, "img_seg_logit": self.linear(late)}
        if self.dual_head:
            preds["img_seg_logit2"] = self.linear2(late)
        if self.middle_block:
            preds["img_middle_feats"] = self.get_img_feats(
                img_indices, self.middle_block, out)
        return preds


# --------------------------------------------------------------------------- #
# Model families (checkpoint layouts: see utils/torch_convert.py:249-262)
# --------------------------------------------------------------------------- #


class LidarSegRef(nn.Module):
    """reference ``models/lidar_model.py:4-22``."""

    def __init__(self, num_classes=20, cr=1.0):
        super().__init__()
        self.backbone = SPVCNNRef(cr=cr)
        self.linear = nn.Linear(self.backbone.cs[-1], num_classes)

    def forward(self, x: SparseTensorRef):
        return {"lidar_seg_logit": self.linear(self.backbone(x))}


class _Net3DSegFused(SPVCNNRef):
    """Net3DSeg SUBCLASSES SPVCNN in the reference (keys land directly on the
    lidar_backbone prefix) — ``middle_fusion.py:10-29`` / ``early_fusion.py``."""

    def __init__(self, num_classes, dual_head, fusion, cr=1.0):
        super().__init__(cr=cr)
        self.fusion = fusion
        tf = nn.Sequential(
            nn.Linear(96, self.cs[4] if fusion == "middle" else self.cs[0]),
            nn.BatchNorm1d(self.cs[4] if fusion == "middle" else self.cs[0]),
            nn.ReLU(True))
        setattr(self, f"{fusion}_fusion_transform", tf)
        self.linear = nn.Linear(self.cs[-1], num_classes)
        self.dual_head = dual_head
        if dual_head:
            self.linear2 = nn.Linear(self.cs[-1], num_classes)

    def forward(self, x, img_feats):
        kw = ({"middle_feats": img_feats,
               "middle_transform": self.middle_fusion_transform}
              if self.fusion == "middle" else
              {"early_feats": img_feats,
               "early_transform": self.early_fusion_transform})
        feats = SPVCNNRef.forward(self, x, **kw)
        preds = {"lidar_seg_logit": self.linear(feats)}
        if self.dual_head:
            preds["lidar_seg_logit2"] = self.linear2(feats)
        return preds


class _Net3DSegLate(nn.Module):
    """Late-fusion 3D stream wraps SPVCNN under ``backbone.``
    (reference ``late_fusion.py:5-35``)."""

    def __init__(self, num_classes, dual_head, cr=1.0):
        super().__init__()
        self.backbone = SPVCNNRef(cr=cr)
        self.linear = nn.Linear(self.backbone.cs[-1], num_classes)
        self.dual_head = dual_head
        if dual_head:
            self.linear2 = nn.Linear(self.backbone.cs[-1], num_classes)

    def forward(self, x):
        feats = self.backbone(x)
        preds = {"lidar_seg_logit": self.linear(feats)}
        if self.dual_head:
            preds["lidar_seg_logit2"] = self.linear2(feats)
        return preds


class FusionTransformerRef(nn.Module):
    """Early/Middle/LateFusionTransformer (reference ``models/*_fusion.py``)."""

    def __init__(self, fusion, num_classes=20, dual_head=True,
                 middle_block=5, late_block=11, img_hw=(370, 1226),
                 vit_kw=None, cr=1.0):
        super().__init__()
        self.fusion = fusion
        self.dual_head = dual_head
        if fusion == "late":
            self.lidar_backbone = _Net3DSegLate(num_classes, dual_head, cr)
        else:
            self.lidar_backbone = _Net3DSegFused(num_classes, dual_head,
                                                 fusion, cr)
        self.image_backbone = Net2DBillinearRef(
            num_classes, dual_head,
            middle_block=None if fusion == "late" else middle_block,
            late_block=late_block, img_hw=img_hw, vit_kw=vit_kw)

    def forward(self, data_dict):
        pi = self.image_backbone(data_dict["img"], data_dict["img_indices"])
        if self.fusion == "late":
            pl = self.lidar_backbone(data_dict["lidar"])
        else:
            pl = self.lidar_backbone(data_dict["lidar"],
                                     pi["img_middle_feats"].detach())
        out = {"lidar_seg_logit": pl["lidar_seg_logit"],
               "img_seg_logit": pi["img_seg_logit"]}
        if self.dual_head:
            out["lidar_seg_logit2"] = pl["lidar_seg_logit2"]
            out["img_seg_logit2"] = pi["img_seg_logit2"]
        return out


def randomize_(model: nn.Module, seed=0):
    """Perturb BN/LN affine params + BN running stats + ViT tokens.

    Weights keep their (already random, unity-ish gain) default inits so
    activations stay bounded through the 20+ layer stacks; random running
    stats are the important part — they catch BN placement/eps bugs that
    unit stats would hide."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.normal_(0.0, 0.1, generator=gen)
                m.running_var.uniform_(0.7, 1.4, generator=gen)
                m.weight.normal_(1.0, 0.1, generator=gen)
                m.bias.normal_(0.0, 0.05, generator=gen)
            if isinstance(m, nn.LayerNorm):
                m.weight.normal_(1.0, 0.1, generator=gen)
                m.bias.normal_(0.0, 0.05, generator=gen)
            if isinstance(m, VisionTransformerRef):
                m.cls_token.normal_(0.0, 0.02, generator=gen)
                m.dist_token.normal_(0.0, 0.02, generator=gen)
                m.pos_embed.normal_(0.0, 0.02, generator=gen)
    return model
