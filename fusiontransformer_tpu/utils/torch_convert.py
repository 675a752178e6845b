"""torch -> flax weight converters.

Covers the reference's pretrained-weight entry points:
* timm DeiT-Base-distilled checkpoints for the ViT backbone (reference
  ``models/transformers.py:79-100`` pulls timm weights; here the user supplies
  a ``.pth``/``.ckpt`` state_dict and this module maps it onto
  ``models.vit.VisionTransformer2D`` params);
* SimCLR-pretrained backbones with a ``backbone.`` prefix
  (reference ``image_models_billinear.py:42-53``);
* torchvision resnet34 for the legacy UNetResNet34 encoder.

Layout rules:
* torch Linear weight [out, in] -> flax kernel [in, out] (transpose);
* patch-embed conv [out, C, kh, kw] -> [(kh, kw, C) flattened, out], matching
  the HWC patch flattening in ``models/vit.py``;
* LayerNorm/BatchNorm weight/bias -> scale/bias (+ running stats into
  ``batch_stats``).
"""

from __future__ import annotations

import numpy as np


def load_torch_state_dict(path, strip_prefix=None):
    """Load a torch checkpoint into a {key: np.ndarray} dict (CPU)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    # CheckpointerV2 payloads (reference common/utils/checkpoint.py:39)
    # nest the model under "model".
    if isinstance(payload, dict) and "model" in payload and not any(
            hasattr(v, "detach") for v in payload.values()):
        payload = payload["model"]
    out = {}
    for k, v in payload.items():
        if strip_prefix:
            if strip_prefix not in k:
                continue
            k = k.replace(strip_prefix, "")
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_deit_to_vit2d(sd, depth=None):
    """Map a timm DeiT(-distilled) state_dict to VisionTransformer2D params.

    Returns a nested dict to merge into variables["params"]["<vit module>"].
    ``depth=None`` infers the block count from the keys.
    """
    if depth is None:
        depth = 1 + max(int(k.split(".")[1]) for k in sd
                        if k.startswith("blocks."))
    p = {}

    w = sd["patch_embed.proj.weight"]          # [D, C, ph, pw]
    d_model = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, d_model)
    p["patch_embed"] = {"kernel": kernel,
                        "bias": sd["patch_embed.proj.bias"]}
    p["cls_token"] = sd["cls_token"]
    if "dist_token" in sd:
        p["dist_token"] = sd["dist_token"]
    p["pos_embed"] = sd["pos_embed"]

    for i in range(depth):
        b = f"blocks.{i}."
        blk = {
            "norm1": {"scale": sd[b + "norm1.weight"],
                      "bias": sd[b + "norm1.bias"]},
            "norm2": {"scale": sd[b + "norm2.weight"],
                      "bias": sd[b + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[b + "attn.qkv.weight"].T,
                        "bias": sd[b + "attn.qkv.bias"]},
                "proj": {"kernel": sd[b + "attn.proj.weight"].T,
                         "bias": sd[b + "attn.proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": sd[b + "mlp.fc1.weight"].T,
                        "bias": sd[b + "mlp.fc1.bias"]},
                "fc2": {"kernel": sd[b + "mlp.fc2.weight"].T,
                        "bias": sd[b + "mlp.fc2.bias"]},
            },
        }
        p[f"block{i}"] = blk
    return _as_f32(p)


def load_pretrained_vit(path, strip_prefix=None, depth=12):
    """Load + convert a DeiT/SimCLR checkpoint; reference entry points:
    IMAGE_PRETRAINED_PATH ('backbone.'-prefixed SimCLR) or a plain timm dump.
    """
    sd = load_torch_state_dict(path, strip_prefix=strip_prefix)
    if not any(k.startswith("patch_embed") for k in sd) and strip_prefix is None:
        # Try the SimCLR layout automatically.
        sd = load_torch_state_dict(path, strip_prefix="backbone.")
    return convert_deit_to_vit2d(sd, depth=depth)


def convert_resnet34_encoder(sd):
    """Map torchvision resnet34 weights to UNetResNet34 encoder params.

    Returns (params, batch_stats) nested dicts for the encoder modules
    (conv1/bn1/layer{1..4}_block{i}).  Decoder stays randomly initialized,
    like the reference (only the encoder is pretrained).
    """
    params = {}
    stats = {}

    def conv(key):
        return {"kernel": sd[key].transpose(2, 3, 1, 0)}

    def bn(prefix):
        return ({"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
                {"mean": sd[prefix + ".running_mean"],
                 "var": sd[prefix + ".running_var"]})

    params["conv1"] = conv("conv1.weight")
    params["bn1"], stats["bn1"] = bn("bn1")

    blocks_per_layer = [3, 4, 6, 3]
    for li, nblocks in enumerate(blocks_per_layer, start=1):
        for bi in range(nblocks):
            src = f"layer{li}.{bi}."
            dst = f"layer{li}_block{bi}"
            bp = {"conv1": conv(src + "conv1.weight"),
                  "conv2": conv(src + "conv2.weight")}
            bs = {}
            bp["bn1"], bs["bn1"] = bn(src + "bn1")
            bp["bn2"], bs["bn2"] = bn(src + "bn2")
            if src + "downsample.0.weight" in sd:
                bp["down_conv"] = conv(src + "downsample.0.weight")
                bp["down_bn"], bs["down_bn"] = bn(src + "downsample.1")
            params[dst] = bp
            stats[dst] = bs
    return _as_f32(params), _as_f32(stats)


# --------------------------------------------------------------------------- #
# SPVCNN (torchsparse) -> flax
#
# torchsparse v1.1.0 enumerates kernel offsets x-FASTEST (KernelRegion builds
# x_offset = single_offset * k**2, z_offset = repeat(single, k**2) — so its
# tap index is k_ts = (dz+1)*9 + (dy+1)*3 + (dx+1) for ks=3 and
# k_ts = bz*4 + by*2 + bx for ks=2), while ops.hierarchy enumerates x-SLOWEST
# (k = (dx+1)*9 + (dy+1)*3 + (dz+1), Morton-compatible).  The permutations
# below are the single place encoding that axis swap.
# --------------------------------------------------------------------------- #

# KS3_PERM[k_ours] = k_torchsparse
KS3_PERM = np.array(
    [(dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)
     for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)], np.int64)
# KS2_PERM[k_ours] = k_torchsparse
KS2_PERM = np.array(
    [bz * 4 + by * 2 + bx
     for bx in (0, 1) for by in (0, 1) for bz in (0, 1)], np.int64)


def convert_spvcnn(sd, prefix="backbone."):
    """Map a reference SPVCNN torch state_dict onto our flax SPVCNN tree.

    ``sd`` keys follow the reference module layout (``models/spvcnn.py:82+``):
    ``stem.{0,3}.kernel``, ``stage{i}.0.net.0.kernel`` (ks2 down),
    ``stage{i}.{1,2}`` / ``up{j}.1.{0,1}`` ResidualBlocks
    (``net.{0,3}.kernel`` + optional ``downsample.0.kernel``),
    ``up{j}.0.net.0.kernel`` (transposed ks2) and
    ``point_transforms.{n}.{0,1}`` Linear+BN1d — optionally under ``prefix``
    (the LidarSeg/fusion wrappers nest the backbone as ``backbone.``).

    Returns (params, batch_stats) nested dicts matching
    ``models.spvcnn.SPVCNN``'s flax naming, tap axes permuted per the
    KS3/KS2 tables above.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} \
        if prefix else dict(sd)
    params, stats = {}, {}

    def conv3(key):
        k = np.asarray(sd[key])                     # [27, Cin, Cout]
        return {"kernel": k[KS3_PERM]}

    def conv2(key):
        k = np.asarray(sd[key])                     # [8, Cin, Cout]
        return {"kernel": k[KS2_PERM]}

    def bn(key):
        return ({"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]},
                {"mean": sd[key + ".running_mean"],
                 "var": sd[key + ".running_var"]})

    def residual(src, dst, has_shortcut):
        params[dst] = {"SubMConv3_0": conv3(src + ".net.0.kernel"),
                       "SubMConv3_1": conv3(src + ".net.3.kernel")}
        stats[dst] = {}
        params[dst]["MaskedBatchNorm_0"], stats[dst]["MaskedBatchNorm_0"] = \
            bn(src + ".net.1")
        params[dst]["MaskedBatchNorm_1"], stats[dst]["MaskedBatchNorm_1"] = \
            bn(src + ".net.4")
        if has_shortcut:
            params[dst]["Conv1x1_0"] = {
                "kernel": np.asarray(sd[src + ".downsample.0.kernel"])}
            params[dst]["MaskedBatchNorm_2"], stats[dst]["MaskedBatchNorm_2"] = \
                bn(src + ".downsample.1")

    params["stem0"] = conv3("stem.0.kernel")
    params["stem0_bn"], stats["stem0_bn"] = bn("stem.1")
    params["stem1"] = conv3("stem.3.kernel")
    params["stem1_bn"], stats["stem1_bn"] = bn("stem.4")

    for i in range(1, 5):
        params[f"stage{i}_down"] = conv2(f"stage{i}.0.net.0.kernel")
        params[f"stage{i}_down_bn"], stats[f"stage{i}_down_bn"] = \
            bn(f"stage{i}.0.net.1")
        for r in (1, 2):
            residual(f"stage{i}.{r}", f"stage{i}_res{r}",
                     has_shortcut=f"stage{i}.{r}.downsample.0.kernel" in sd)

    for j in range(1, 5):
        params[f"up{j}_deconv"] = conv2(f"up{j}.0.net.0.kernel")
        params[f"up{j}_deconv_bn"], stats[f"up{j}_deconv_bn"] = \
            bn(f"up{j}.0.net.1")
        for r in (1, 2):
            residual(f"up{j}.1.{r-1}", f"up{j}_res{r}",
                     has_shortcut=f"up{j}.1.{r-1}.downsample.0.kernel" in sd)

    for n in range(3):
        src = f"point_transforms.{n}"
        params[f"point_transform{n}"] = {
            "TorchLinear_0": {"kernel": np.asarray(sd[src + ".0.weight"]).T,
                              "bias": sd[src + ".0.bias"]}}
        (params[f"point_transform{n}"]["MaskedBatchNorm_0"],
         s) = bn(src + ".1")
        stats[f"point_transform{n}"] = {"MaskedBatchNorm_0": s}

    return _as_f32(params), _as_f32(stats)


def convert_linear_head(sd, key="linear"):
    """torch nn.Linear head -> flax TorchLinear params."""
    return _as_f32({"kernel": np.asarray(sd[key + ".weight"]).T,
                    "bias": sd[key + ".bias"]})


# --------------------------------------------------------------------------- #
# Full trained reference models -> our variables trees.
#
# Reference checkpoint layouts (CheckpointerV2 payloads store the model
# state_dict under "model"):
#   LidarSeg                  backbone.* + linear.*            lidar_model.py:4
#   Early/MiddleFusion        lidar_backbone.* = SPVCNN keys directly
#     (Net3DSeg SUBCLASSES SPVCNN, middle_fusion.py:10 / early_fusion.py)
#     + lidar_backbone.{middle|early}_fusion_transform.{0,1}
#     + lidar_backbone.linear(2) ; image_backbone.* = Net2DBillinear
#   LateFusion                lidar_backbone.backbone.* (late_fusion.py:13)
#   Net2DBillinear            sample_down.stem.{0,2}, backbone.* (timm DeiT),
#     up.<block>.stem.{0,2}, linear(2)    image_models_billinear.py:8-86
# --------------------------------------------------------------------------- #


def _conv1x1_as_linear(sd, key):
    w = np.asarray(sd[key + ".weight"])          # [out, in, 1, 1]
    return {"kernel": w[:, :, 0, 0].T, "bias": sd[key + ".bias"]}


def _bn_pair(sd, key):
    return ({"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]},
            {"mean": sd[key + ".running_mean"],
             "var": sd[key + ".running_var"]})


def convert_image_model(sd, prefix="", middle_block=None, late_block=11):
    """Reference ``Net2DBillinear`` state_dict -> our ``Net2DBilinear`` tree."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    params, stats = {}, {}
    params["sample_down"] = {"conv": _conv1x1_as_linear(sd, "sample_down.stem.0")}
    params["sample_down"]["bn"], sdb = _bn_pair(sd, "sample_down.stem.2")
    stats["sample_down"] = {"bn": sdb}
    params["backbone"] = convert_deit_to_vit2d(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")})
    blocks = [late_block] + ([middle_block] if middle_block is not None
                             and middle_block != late_block else [])
    for b in blocks:
        params[f"up_{b}"] = {"conv": _conv1x1_as_linear(sd, f"up.{b}.stem.0")}
        params[f"up_{b}"]["bn"], s = _bn_pair(sd, f"up.{b}.stem.2")
        stats[f"up_{b}"] = {"bn": s}
    params["linear"] = {"kernel": np.asarray(sd["linear.weight"]).T,
                        "bias": sd["linear.bias"]}
    if "linear2.weight" in sd:
        params["linear2"] = {"kernel": np.asarray(sd["linear2.weight"]).T,
                             "bias": sd["linear2.bias"]}
    return _as_f32(params), _as_f32(stats)


def convert_lidarseg(sd):
    """Reference ``LidarSeg`` -> (params, batch_stats) for our LidarSeg."""
    bp, bs = convert_spvcnn(sd, prefix="backbone.")
    params = {"backbone": bp, "linear": convert_linear_head(sd)}
    return _as_f32(params), _as_f32({"backbone": bs})


def convert_fusion_model(sd, fusion, middle_block=None, late_block=11):
    """Reference Early/Middle/LateFusionTransformer -> our variables tree.

    Args:
      sd: model state_dict (flat torch keys).
      fusion: 'early' | 'middle' | 'late'.
    Returns:
      (params, batch_stats) nested dicts for ``FusionTransformerBase``.
    """
    spv_prefix = ("lidar_backbone.backbone." if fusion == "late"
                  else "lidar_backbone.")
    spv_p, spv_s = convert_spvcnn(sd, prefix=spv_prefix)
    if fusion in ("early", "middle"):
        key = f"lidar_backbone.{fusion}_fusion_transform"
        spv_p["fusion_linear"] = {
            "kernel": np.asarray(sd[key + ".0.weight"]).T,
            "bias": sd[key + ".0.bias"]}
        spv_p["fusion_bn"], s = _bn_pair(sd, key + ".1")
        spv_s["fusion_bn"] = s
    lid_p = {"backbone": spv_p,
             "linear": convert_linear_head(sd, "lidar_backbone.linear")}
    if "lidar_backbone.linear2.weight" in sd:
        lid_p["linear2"] = convert_linear_head(sd, "lidar_backbone.linear2")
    img_p, img_s = convert_image_model(sd, prefix="image_backbone.",
                                       middle_block=middle_block,
                                       late_block=late_block)
    params = {"lidar_backbone": lid_p, "image_backbone": img_p}
    stats = {"lidar_backbone": {"backbone": spv_s},
             "image_backbone": img_s}
    return _as_f32(params), _as_f32(stats)


def merge_params(target, updates, path=""):
    """Recursively overwrite matching leaves of ``target`` with ``updates``,
    asserting shape agreement; returns the count of replaced leaves."""
    n = 0
    for k, v in updates.items():
        assert k in target, f"missing param {path}/{k} in target"
        if isinstance(v, dict):
            n += merge_params(target[k], v, f"{path}/{k}")
        else:
            tgt = target[k]
            assert tuple(np.shape(tgt)) == tuple(np.shape(v)), (
                f"shape mismatch at {path}/{k}: {np.shape(tgt)} vs {np.shape(v)}")
            target[k] = np.asarray(v, dtype=np.asarray(tgt).dtype)
            n += 1
    return n


def _as_f32(tree):
    if isinstance(tree, dict):
        return {k: _as_f32(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)
