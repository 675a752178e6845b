#!/usr/bin/env python
"""Full-topology torch-CPU proxy of the reference flagship forward.

Round-1's baseline proxy timed ONLY a torch-CPU DeiT-Base-384 forward
(``bench.py``), declaring it a strict underestimate of the reference's
per-scan cost.  This tool closes that gap (VERDICT r1 "CPU-proxy baseline
is thin"): it times the reference MiddleFusionTransformer's ENTIRE
per-scan forward — DeiT + per-block lifting heads with the full-resolution
upsample + torchsparse-semantics SPVCNN — on CPU, with the same scan
shapes the TPU bench uses.

Everything here follows the reference's computation graph (cited below),
re-implemented from behavior: torchsparse's hash-query kernel maps become
sorted-key searchsorted joins; its gather-GEMM-scatter conv is an explicit
per-offset loop (reference ``models/spvcnn.py:98-233``, ``models/utils.py``,
``models/middle_fusion.py:47-118``, ``models/image_models_billinear.py:
72-124``).  Forward-only, float32, eval-mode BN — a LOWER bound on the
reference's train-time cost, but now covering every stage, not just the ViT.

Writes ``bench_baseline.json`` with both proxies; ``bench.py`` divides by
the full one when present.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import torch
import torch.nn as nn

torch.set_num_threads(os.cpu_count() or 1)

CS = [32, 32, 64, 128, 256, 256, 128, 96, 96]   # spvcnn.py:87 channel plan
OFFS3 = np.array([(x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1)
                  for z in (-1, 0, 1)], np.int64)          # 27 ks3 taps
OFFS2 = np.array([(x, y, z) for x in (0, 1) for y in (0, 1)
                  for z in (0, 1)], np.int64)               # 8 ks2 taps


def _keys(c):
    """Pack int voxel coords to sortable int64 keys (coords < 2^20)."""
    c = np.asarray(c, np.int64)
    return (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]


def _query(table_keys, sort_perm, q):
    """Hash-query equivalent: row index in the table for each query key,
    -1 when absent (torchsparse sphashquery semantics)."""
    pos = np.searchsorted(table_keys, q)
    pos = np.clip(pos, 0, len(table_keys) - 1)
    hit = table_keys[pos] == q
    return np.where(hit, sort_perm[pos], -1)


class KernelMaps:
    """Per-level coord tables + ks3 kernel maps, built once per scan like
    torchsparse's cached rulebooks."""

    def __init__(self, coords):
        self.levels = [np.asarray(coords, np.int64)]

    def level(self, l):
        while len(self.levels) <= l:
            prev = self.levels[-1]
            self.levels.append(np.unique(prev // 2, axis=0))
        return self.levels[l]

    def maps3(self, l):
        c = self.level(l)
        k = _keys(c)
        perm = np.argsort(k, kind="stable")
        ks = k[perm]
        out = np.stack([_query(ks, perm, _keys(c + o)) for o in OFFS3])
        return out                                   # [27, V]

    def maps2(self, l):
        """Child map for stride-2 conv level l -> l+1: [8, Vcoarse]."""
        fine, coarse = self.level(l), self.level(l + 1)
        k = _keys(fine)
        perm = np.argsort(k, kind="stable")
        ks = k[perm]
        return np.stack([_query(ks, perm, _keys(coarse * 2 + o))
                         for o in OFFS2])


def subm_conv3(x, w, maps):
    """ks3 stride1: per-offset gather -> GEMM -> scatter-add."""
    V, Co = x.shape[0], w.shape[2]
    out = torch.zeros(V, Co)
    for t in range(27):
        idx = maps[t]
        m = idx >= 0
        if not m.any():
            continue
        out[m] += x[idx[m]] @ w[t]
    return out


def down_conv2(x, w, maps2):
    Vc, Co = maps2.shape[1], w.shape[2]
    out = torch.zeros(Vc, Co)
    for t in range(8):
        idx = maps2[t]
        m = idx >= 0
        if m.any():
            out[m] += x[idx[m]] @ w[t]
    return out


def up_conv2(xc, w, maps2):
    """Transposed: each fine voxel reads its (parent, offset) product."""
    Vf = int(maps2.max()) + 1
    out = torch.zeros(Vf, w.shape[2])
    for t in range(8):
        idx = maps2[t]
        m = idx >= 0
        if m.any():
            out[idx[m]] += xc[m] @ w[t]
    return out


class ConvBNReLU(nn.Module):
    def __init__(self, ci, co, taps=27, relu=True):
        super().__init__()
        self.w = nn.Parameter(torch.randn(taps, ci, co) * (ci * taps) ** -0.5)
        self.bn = nn.BatchNorm1d(co)
        self.relu = relu

    def forward(self, x, maps, mode):
        y = {27: subm_conv3, 8: down_conv2, -8: up_conv2}[mode](x, self.w, maps)
        y = self.bn(y)
        return torch.relu(y) if self.relu else y


class Residual(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.c1 = ConvBNReLU(ci, co)
        self.c2 = ConvBNReLU(co, co, relu=False)
        self.short = None if ci == co else nn.Linear(ci, co, bias=False)

    def forward(self, x, maps):
        y = self.c2(self.c1(x, maps, 27), maps, 27)
        s = x if self.short is None else self.short(x)
        return torch.relu(y + s)


class SPVCNNProxy(nn.Module):
    """Reference spvcnn.py:82-233 forward graph, torch CPU."""

    def __init__(self, in_ch=4):
        super().__init__()
        cs = CS
        self.stem0 = ConvBNReLU(in_ch, cs[0])
        self.stem1 = ConvBNReLU(cs[0], cs[0])
        self.downs = nn.ModuleList()
        self.res = nn.ModuleList()
        chain = [cs[0], cs[1], cs[2], cs[3], cs[4]]
        for i in range(4):
            self.downs.append(ConvBNReLU(chain[i], chain[i], taps=8))
            self.res.append(nn.ModuleList(
                [Residual(chain[i], chain[i + 1]),
                 Residual(chain[i + 1], chain[i + 1])]))
        self.ups = nn.ModuleList()
        self.upres = nn.ModuleList()
        up_in = [cs[4], cs[5], cs[6], cs[7]]
        up_out = [cs[5], cs[6], cs[7], cs[8]]
        skips = [cs[3], cs[2], cs[1], cs[0]]
        for i in range(4):
            self.ups.append(ConvBNReLU(up_in[i], up_out[i], taps=8))
            self.upres.append(nn.ModuleList(
                [Residual(up_out[i] + skips[i], up_out[i]),
                 Residual(up_out[i], up_out[i])]))
        self.pt0 = nn.Sequential(nn.Linear(cs[0], cs[4]),
                                 nn.BatchNorm1d(cs[4]), nn.ReLU())
        self.pt1 = nn.Sequential(nn.Linear(cs[4], cs[6]),
                                 nn.BatchNorm1d(cs[6]), nn.ReLU())
        self.pt2 = nn.Sequential(nn.Linear(cs[6], cs[8]),
                                 nn.BatchNorm1d(cs[8]), nn.ReLU())
        self.fuse = nn.Sequential(nn.Linear(96, cs[4]),
                                  nn.BatchNorm1d(cs[4]), nn.ReLU())

    def forward(self, feats, km, pt_vox, img_point_feats):
        maps0 = [torch.from_numpy(km.maps3(l)) for l in range(5)]
        maps2 = [torch.from_numpy(km.maps2(l)) for l in range(4)]

        x = self.stem1(self.stem0(feats, maps0[0], 27), maps0[0], 27)
        z0 = x[pt_vox]                       # voxel_to_point, stride 1
        skips = [x]
        for i in range(4):
            h = self.downs[i](x, maps2[i], 8)
            h = self.res[i][0](h, maps0[i + 1])
            x = self.res[i][1](h, maps0[i + 1])
            if i < 3:
                skips.append(x)
        # z1 = v2p(x4) + PT0(z0) + middle fusion injection (detached feats)
        z1 = x[pt_vox_level(km, pt_vox, 4)] + self.pt0(z0) \
            + self.fuse(img_point_feats.detach())
        x = scatter_mean(z1, pt_vox_level(km, pt_vox, 4), len(km.level(4)))
        for i in range(4):
            x = self.ups[i](x, maps2[3 - i], -8)
            x = torch.cat([x, skips[3 - i]], 1)
            x = self.upres[i][0](x, maps0[3 - i])
            x = self.upres[i][1](x, maps0[3 - i])
            if i == 1:
                z2 = x[pt_vox_level(km, pt_vox, 2)] + self.pt1(z1)
                x = scatter_mean(z2, pt_vox_level(km, pt_vox, 2),
                                 len(km.level(2)))
        z3 = x[pt_vox] + self.pt2(z2)
        return z3


def pt_vox_level(km, pt_vox0, l):
    """Point -> level-l voxel row (via the level-0 coord >> l join)."""
    c = km.level(0)[pt_vox0] // (2 ** l)
    tab = km.level(l)
    k = _keys(tab)
    perm = np.argsort(k, kind="stable")
    return torch.from_numpy(_query(k[perm], perm, _keys(c))).long()


def scatter_mean(pt_feats, idx, nvox):
    out = torch.zeros(nvox, pt_feats.shape[1])
    cnt = torch.zeros(nvox, 1)
    out.index_add_(0, idx, pt_feats)
    cnt.index_add_(0, idx, torch.ones(len(idx), 1))
    return out / cnt.clamp(min=1)


class Block(nn.Module):
    def __init__(self, d=768, h=12):
        super().__init__()
        self.n1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, h, batch_first=True)
        self.n2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(),
                                 nn.Linear(4 * d, d))

    def forward(self, x):
        h = self.n1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        return x + self.mlp(self.n2(x))


class DeiTTaps(nn.Module):
    """DeiT-Base-384 forward returning the per-block taps the reference's
    Net2DBillinear lifts (transformers.py:16-45)."""

    def __init__(self, taps=(5, 11)):
        super().__init__()
        self.patch = nn.Conv2d(3, 768, 16, 16)
        self.blocks = nn.ModuleList([Block() for _ in range(12)])
        self.taps = taps

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2)
        x = torch.cat([torch.zeros(x.shape[0], 2, 768), x], 1)
        out = {}
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i in self.taps:
                out[i] = x[:, 2:]            # strip cls/dist tokens
        return out


class LiftHead(nn.Module):
    """BilinearModule: 1x1 conv 768->96 + ReLU + BN + full-res upsample +
    per-point gather (image_models_billinear.py:8-23,72-124)."""

    def __init__(self, h=370, w=1226):
        super().__init__()
        self.conv = nn.Conv2d(768, 96, 1)
        self.bn = nn.BatchNorm2d(96)
        self.up = nn.Upsample(size=(h, w), mode="bilinear",
                              align_corners=False)

    def forward(self, tap, img_idx):
        b, n, d = tap.shape
        g = int(round(n ** 0.5))
        x = tap.transpose(1, 2).reshape(b, d, g, g)
        x = self.up(self.bn(torch.relu(self.conv(x))))
        return x[0, :, img_idx[:, 0], img_idx[:, 1]].T   # [N, 96]


def make_scan(points=18_000, seed=0):
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN
    ds = SyntheticSCN(split=("train",), num_scans=1, num_points=points)
    item = ds[0]
    coords = np.asarray(item["coords"], np.int64)
    # sparse_quantize: unique voxels + point->voxel inverse map.
    vox, inv = np.unique(_keys(coords), return_inverse=True)
    order = np.argsort(_keys(coords), kind="stable")
    uniq_rows = order[np.searchsorted(_keys(coords)[order], vox)]
    return (coords[uniq_rows], np.asarray(item["feats"], np.float32),
            inv.astype(np.int64),
            np.asarray(item["img_indices"], np.int64))


def main():
    vox_coords, pt_feats, pt_vox, img_idx = make_scan()
    print(f"scan: {len(pt_feats)} points, {len(vox_coords)} voxels",
          file=sys.stderr)

    deit = DeiTTaps().eval()
    lift_mid, lift_late = LiftHead().eval(), LiftHead().eval()
    head2d = nn.Linear(96, 20)
    head3d = nn.Linear(CS[8], 20)
    spvcnn = SPVCNNProxy().eval()
    img = torch.randn(1, 3, 384, 384)
    feats = torch.from_numpy(pt_feats)
    img_idx_t = torch.from_numpy(img_idx)

    def one_scan():
        km = KernelMaps(vox_coords)         # rulebooks rebuilt per scan
        taps = deit(img)
        f_mid = lift_mid(taps[5], img_idx_t)
        f_late = lift_late(taps[11], img_idx_t)
        vox_feats = scatter_mean(feats, torch.from_numpy(pt_vox),
                                 len(vox_coords))
        z3 = spvcnn(vox_feats, km, torch.from_numpy(pt_vox), f_mid)
        return head3d(z3), head2d(f_late)

    with torch.no_grad():
        one_scan()                           # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            one_scan()
            times.append(time.perf_counter() - t0)
    per_scan = float(np.median(times))
    print(f"full reference proxy: {per_scan*1000:.0f} ms/scan "
          f"({1/per_scan:.3f} scans/s)", file=sys.stderr)

    path = os.path.join(REPO, "bench_baseline.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.update({
        "cpu_proxy_full_scans_per_sec": 1.0 / per_scan,
        "cpu_proxy_full_sec_per_scan": per_scan,
        "full_note": "torch CPU, full reference flagship forward: DeiT-384 "
                     "+ 2 lifting heads w/ (370,1226) upsample + torchsparse"
                     "-semantics SPVCNN + middle fusion; forward-only eval "
                     "mode (still a lower bound on train cost)",
    })
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({"cpu_proxy_full_scans_per_sec": 1.0 / per_scan}))


if __name__ == "__main__":
    main()
