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
    out = {}
    for k, v in payload.items():
        if strip_prefix:
            if strip_prefix not in k:
                continue
            k = k.replace(strip_prefix, "")
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_deit_to_vit2d(sd, depth=12):
    """Map a timm DeiT(-distilled) state_dict to VisionTransformer2D params.

    Returns a nested dict to merge into variables["params"]["<vit module>"].
    """
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
