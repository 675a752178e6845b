"""SPVCNN torch-weight import: offset permutation, direction, full-tree merge.

The reference trains SPVCNN with torchsparse v1.1.0 (``models/spvcnn.py``);
its conv kernels enumerate taps x-fastest while ops.hierarchy enumerates
x-slowest (Morton-compatible).  These tests pin the conversion:

* a kernel that is nonzero only at torchsparse tap (dx,dy,dz)=(1,0,0) must,
  after conversion, read each voxel's +x neighbor (validates both the
  KS3_PERM axis swap and the gather direction out[v] = sum_k W[k]^T
  feats[v + off_k]);
* a synthetic full reference state_dict must merge onto every conv/BN/linear
  leaf of our flax SPVCNN tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.utils import torch_convert as tc


def _dense_block_hier(n=4):
    """A fully dense n^3 voxel block (every neighbor exists away from edges)."""
    g = np.arange(n, dtype=np.int32)
    coords = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    N = coords.shape[0]
    caps = (N, max(128, N), 128, 128, 128)
    hier = build_hierarchy(jnp.asarray(coords), jnp.zeros(N, jnp.int32),
                           jnp.ones(N, bool), caps)
    return coords, hier


def test_ks3_perm_reads_plus_x_neighbor():
    coords, hier = _dense_block_hier(4)
    N = coords.shape[0]
    C = 4
    feats = jnp.asarray(np.random.RandomState(0).randn(N, C), jnp.float32)

    # torchsparse tap index for offset (dx,dy,dz)=(1,0,0): x fastest.
    k_ts = (0 + 1) * 9 + (0 + 1) * 3 + (1 + 1)
    w_ts = np.zeros((27, C, C), np.float32)
    w_ts[k_ts] = np.eye(C)
    w = jnp.asarray(w_ts[tc.KS3_PERM])

    # Our tap index for (1,0,0) is x-slowest.
    k_ours = (1 + 1) * 9 + (0 + 1) * 3 + (0 + 1)
    assert np.allclose(np.asarray(w)[k_ours], np.eye(C))

    # Run the conv on the sorted level-0 voxels: out[v] == feats at c_v+(1,0,0)
    lvl = hier.levels[0]
    feats_sorted = sc.gather_rows(feats, hier.vox0_point_idx)
    out = np.asarray(sc.subm_conv3(feats_sorted, w, lvl.nbr_idx,
                                   compute_dtype=jnp.float32))
    cs = np.asarray(lvl.coords)
    fs = np.asarray(feats_sorted)
    lut = {tuple(c): i for i, c in enumerate(cs)}
    for i, c in enumerate(cs):
        nb = (c[0] + 1, c[1], c[2])
        expect = fs[lut[nb]] if nb in lut else np.zeros(C)
        assert np.allclose(out[i], expect, atol=1e-4), (i, c)


def _bn_sd(key, c):
    return {key + ".weight": np.ones(c, np.float32),
            key + ".bias": np.zeros(c, np.float32),
            key + ".running_mean": np.zeros(c, np.float32),
            key + ".running_var": np.ones(c, np.float32)}


def _fake_spvcnn_sd(rs):
    """Synthesize a reference-layout SPVCNN state_dict (unprefixed keys)."""
    cs = [32, 32, 64, 128, 256, 256, 128, 96, 96]
    sd = {}

    def conv(key, k, cin, cout):
        sd[key] = rs.randn(k, cin, cout).astype(np.float32) * 0.05 \
            if k > 1 else rs.randn(cin, cout).astype(np.float32) * 0.05

    def bn(key, c):
        sd.update(_bn_sd(key, c))

    def res(pre, cin, cout):
        conv(pre + ".net.0.kernel", 27, cin, cout)
        bn(pre + ".net.1", cout)
        conv(pre + ".net.3.kernel", 27, cout, cout)
        bn(pre + ".net.4", cout)
        if cin != cout:
            conv(pre + ".downsample.0.kernel", 1, cin, cout)
            bn(pre + ".downsample.1", cout)

    conv("stem.0.kernel", 27, 4, cs[0]); bn("stem.1", cs[0])
    conv("stem.3.kernel", 27, cs[0], cs[0]); bn("stem.4", cs[0])
    down_in = [cs[0], cs[1], cs[2], cs[3]]
    out_ch = [cs[1], cs[2], cs[3], cs[4]]
    for i in range(4):
        conv(f"stage{i+1}.0.net.0.kernel", 8, down_in[i], down_in[i])
        bn(f"stage{i+1}.0.net.1", down_in[i])
        res(f"stage{i+1}.1", down_in[i], out_ch[i])
        res(f"stage{i+1}.2", out_ch[i], out_ch[i])
    up_specs = [  # (deconv_in, deconv_out, skip)
        (cs[4], cs[5], cs[3]), (cs[5], cs[6], cs[2]),
        (cs[6], cs[7], cs[1]), (cs[7], cs[8], cs[0])]
    for j, (din, dout, skip) in enumerate(up_specs, start=1):
        conv(f"up{j}.0.net.0.kernel", 8, din, dout)
        bn(f"up{j}.0.net.1", dout)
        res(f"up{j}.1.0", dout + skip, dout)
        res(f"up{j}.1.1", dout, dout)
    pt = [(cs[0], cs[4]), (cs[4], cs[6]), (cs[6], cs[8])]
    for n, (cin, cout) in enumerate(pt):
        sd[f"point_transforms.{n}.0.weight"] = \
            rs.randn(cout, cin).astype(np.float32) * 0.05
        sd[f"point_transforms.{n}.0.bias"] = np.zeros(cout, np.float32)
        bn(f"point_transforms.{n}.1", cout)
    return sd


def _fake_reference_sd():
    rs = np.random.RandomState(1)
    sd = _fake_spvcnn_sd(rs)
    return {"backbone." + k: v for k, v in sd.items()} | {
        "linear.weight": rs.randn(20, 96).astype(np.float32) * 0.05,
        "linear.bias": np.zeros(20, np.float32)}


@pytest.mark.slow
def test_full_tree_merge():
    from fusiontransformer_tpu.models.lidar_model import LidarSeg

    coords, hier = _dense_block_hier(6)
    N = coords.shape[0]
    model = LidarSeg(num_classes=20)
    variables = model.init(jax.random.PRNGKey(0),
                           {"feats": jnp.zeros((N, 4), jnp.float32)},
                           hier, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = _fake_reference_sd()
    p_new, s_new = tc.convert_spvcnn(sd, prefix="backbone.")
    n_p = tc.merge_params(params["backbone"], p_new)
    n_s = tc.merge_params(stats["backbone"], s_new)
    n_h = tc.merge_params(params["linear"], tc.convert_linear_head(sd))

    n_param_leaves = len(jax.tree_util.tree_leaves(variables["params"]))
    n_stat_leaves = len(jax.tree_util.tree_leaves(variables["batch_stats"]))
    assert n_p + n_h == n_param_leaves, (n_p, n_h, n_param_leaves)
    assert n_s == n_stat_leaves

    # Forward must run with the merged weights and produce finite logits.
    out = model.apply({"params": params, "batch_stats": stats},
                      {"feats": jnp.ones((N, 4), jnp.float32)}, hier,
                      train=False)
    assert np.isfinite(np.asarray(out["lidar_seg_logit"])).all()


def _fake_deit_sd(rs, depth=2, d=64, tokens=16):
    sd = {"patch_embed.proj.weight": rs.randn(d, 3, 16, 16).astype(np.float32) * 0.02,
          "patch_embed.proj.bias": np.zeros(d, np.float32),
          "cls_token": rs.randn(1, 1, d).astype(np.float32) * 0.02,
          "dist_token": rs.randn(1, 1, d).astype(np.float32) * 0.02,
          "pos_embed": rs.randn(1, tokens + 2, d).astype(np.float32) * 0.02}
    for i in range(depth):
        b = f"blocks.{i}."
        for nm in ("norm1", "norm2"):
            sd[b + nm + ".weight"] = np.ones(d, np.float32)
            sd[b + nm + ".bias"] = np.zeros(d, np.float32)
        sd[b + "attn.qkv.weight"] = rs.randn(3 * d, d).astype(np.float32) * 0.02
        sd[b + "attn.qkv.bias"] = np.zeros(3 * d, np.float32)
        sd[b + "attn.proj.weight"] = rs.randn(d, d).astype(np.float32) * 0.02
        sd[b + "attn.proj.bias"] = np.zeros(d, np.float32)
        sd[b + "mlp.fc1.weight"] = rs.randn(4 * d, d).astype(np.float32) * 0.02
        sd[b + "mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
        sd[b + "mlp.fc2.weight"] = rs.randn(d, 4 * d).astype(np.float32) * 0.02
        sd[b + "mlp.fc2.bias"] = np.zeros(d, np.float32)
    return sd


@pytest.mark.slow
def test_full_fusion_checkpoint_conversion():
    """A synthetic reference MiddleFusionTransformer state_dict converts onto
    every leaf of our FusionTransformerBase tree and the forward runs."""
    from fusiontransformer_tpu.models.fusion import FusionTransformerBase

    rs = np.random.RandomState(7)
    d, depth, ncls = 64, 2, 20
    sd = {}
    # lidar side: Net3DSeg SUBCLASSES SPVCNN -> keys directly on the prefix
    for k, v in _fake_spvcnn_sd(rs).items():
        sd["lidar_backbone." + k] = v
    sd["lidar_backbone.middle_fusion_transform.0.weight"] = \
        rs.randn(256, 96).astype(np.float32) * 0.05
    sd["lidar_backbone.middle_fusion_transform.0.bias"] = \
        np.zeros(256, np.float32)
    for s, v in _bn_sd("lidar_backbone.middle_fusion_transform.1", 256).items():
        sd[s] = v
    for head in ("linear", "linear2"):
        sd[f"lidar_backbone.{head}.weight"] = \
            rs.randn(ncls, 96).astype(np.float32) * 0.05
        sd[f"lidar_backbone.{head}.bias"] = np.zeros(ncls, np.float32)
    # image side
    sd["image_backbone.sample_down.stem.0.weight"] = \
        rs.randn(3, 3, 1, 1).astype(np.float32)
    sd["image_backbone.sample_down.stem.0.bias"] = np.zeros(3, np.float32)
    for s, v in _bn_sd("image_backbone.sample_down.stem.2", 3).items():
        sd[s] = v
    for k, v in _fake_deit_sd(rs, depth=depth, d=d).items():
        sd["image_backbone.backbone." + k] = v
    for blk in (0, 1):
        sd[f"image_backbone.up.{blk}.stem.0.weight"] = \
            rs.randn(96, d, 1, 1).astype(np.float32) * 0.05
        sd[f"image_backbone.up.{blk}.stem.0.bias"] = np.zeros(96, np.float32)
        for s, v in _bn_sd(f"image_backbone.up.{blk}.stem.2", 96).items():
            sd[s] = v
    for head in ("linear", "linear2"):
        sd[f"image_backbone.{head}.weight"] = \
            rs.randn(ncls, 96).astype(np.float32) * 0.05
        sd[f"image_backbone.{head}.bias"] = np.zeros(ncls, np.float32)

    params, stats = tc.convert_fusion_model(sd, "middle", middle_block=0,
                                            late_block=1)

    coords, hier = _dense_block_hier(6)
    N = coords.shape[0]
    model = FusionTransformerBase(
        num_classes=ncls, dual_head=True, fusion="middle",
        middle_feat_block=0, late_feat_block=1,
        image_height=37, image_width=122,
        vit_img_size=64, vit_patch=16, vit_embed_dim=d, vit_depth=depth,
        vit_heads=2, compute_dtype=jnp.float32)
    batch = {"feats": jnp.ones((N, 4), jnp.float32),
             "img": jnp.zeros((1, 37, 122, 3), jnp.float32),
             "img_indices": jnp.zeros((N, 2), jnp.int32),
             "pt_batch": jnp.zeros((N,), jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch, hier, train=False)
    tgt_p = jax.tree_util.tree_map(np.asarray, variables["params"])
    tgt_s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    n_p = tc.merge_params(tgt_p, params)
    n_s = tc.merge_params(tgt_s, stats)
    assert n_p == len(jax.tree_util.tree_leaves(tgt_p)), \
        (n_p, len(jax.tree_util.tree_leaves(tgt_p)))
    assert n_s == len(jax.tree_util.tree_leaves(tgt_s))

    out = model.apply({"params": tgt_p, "batch_stats": tgt_s}, batch, hier,
                      train=False)
    for k in ("lidar_seg_logit", "img_seg_logit", "lidar_seg_logit2",
              "img_seg_logit2"):
        assert np.isfinite(np.asarray(out[k])).all(), k
