"""Numeric parity: torch DeiT forward vs flax VisionTransformer2D with
converted weights (tiny config; exact-gelu, pre-norm, distilled tokens)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fusiontransformer_tpu.models.vit import VisionTransformer2D  # noqa: E402
from fusiontransformer_tpu.utils.torch_convert import (  # noqa: E402
    convert_deit_to_vit2d, merge_params)

D, HEADS, DEPTH, IMG, PATCH = 32, 2, 2, 32, 16


class TorchBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(D, eps=1e-6)
        self.norm2 = torch.nn.LayerNorm(D, eps=1e-6)
        self.attn = torch.nn.ModuleDict()
        self.attn["qkv"] = torch.nn.Linear(D, 3 * D)
        self.attn["proj"] = torch.nn.Linear(D, D)
        self.mlp = torch.nn.ModuleDict()
        self.mlp["fc1"] = torch.nn.Linear(D, 4 * D)
        self.mlp["fc2"] = torch.nn.Linear(4 * D, D)

    def forward(self, x):
        b, n, d = x.shape
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(b, n, 3, HEADS, d // HEADS)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (d // HEADS) ** -0.5
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn["proj"](out)
        h = self.norm2(x)
        h = self.mlp["fc2"](torch.nn.functional.gelu(self.mlp["fc1"](h)))
        return x + h


class TorchDeiT(torch.nn.Module):
    """timm-layout DeiT (distilled) at a tiny config."""

    def __init__(self):
        super().__init__()
        g = IMG // PATCH
        self.patch_embed = torch.nn.ModuleDict(
            {"proj": torch.nn.Conv2d(3, D, PATCH, PATCH)})
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.dist_token = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, g * g + 2, D) * 0.02)
        self.blocks = torch.nn.ModuleList([TorchBlock() for _ in range(DEPTH)])

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1),
                       self.dist_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        outs = {}
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            outs[str(i)] = x[:, 2:, :]
        return outs


def test_deit_conversion_parity(rng):
    tm = TorchDeiT().eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    # Rename ModuleDict keys to timm layout (attn.qkv.weight etc. already ok).
    sd = {k.replace("patch_embed.proj", "patch_embed.proj"): v
          for k, v in sd.items()}
    sd_np = {k: v.numpy() for k, v in sd.items()}
    converted = convert_deit_to_vit2d(sd_np, depth=DEPTH)

    model = VisionTransformer2D(img_size=IMG, patch_size=PATCH, embed_dim=D,
                                depth=DEPTH, num_heads=HEADS, distilled=True,
                                compute_dtype=jnp.float32)
    img = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    n = merge_params(params, converted)
    assert n >= 4 + DEPTH * 12

    ours = model.apply({"params": params}, jnp.asarray(img))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    for i in range(DEPTH):
        np.testing.assert_allclose(np.asarray(ours[str(i)]),
                                   theirs[str(i)].numpy(),
                                   rtol=2e-4, atol=2e-4)


def _hf_deit_to_timm_sd(hf_model):
    """Re-express an HF DeiT state dict in timm 0.4.9's key layout.

    The genuine ``deit_base_distilled_patch16_384`` file (reference
    ``models/transformers.py:79-100``, timm==0.4.9 in ``setup.py:13``) uses
    fused ``blocks.i.attn.qkv`` weights, ``cls_token``/``dist_token``/
    ``pos_embed`` (order cls, dist, patches) and ``head``/``head_dist``
    classifier keys.  HuggingFace's independently-written DeiT stores the
    same pretrained tensors under split q/k/v and renamed modules — mapping
    HF -> timm here gives a REAL-layout checkpoint backed by an independent
    torch implementation to verify the converter against (VERDICT r1 #3).
    """
    import torch

    hf = dict(hf_model.state_dict())
    sd = {
        "cls_token": hf["deit.embeddings.cls_token"],
        "dist_token": hf["deit.embeddings.distillation_token"],
        "pos_embed": hf["deit.embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            hf["deit.embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            hf["deit.embeddings.patch_embeddings.projection.bias"],
        "norm.weight": hf["deit.layernorm.weight"],
        "norm.bias": hf["deit.layernorm.bias"],
        # classifier keys a real timm file carries; converter must skip them
        "head.weight": hf["cls_classifier.weight"],
        "head.bias": hf["cls_classifier.bias"],
        "head_dist.weight": hf["distillation_classifier.weight"],
        "head_dist.bias": hf["distillation_classifier.bias"],
    }
    i = 0
    while f"deit.encoder.layer.{i}.layernorm_before.weight" in hf:
        p = f"deit.encoder.layer.{i}."
        t = f"blocks.{i}."
        sd[t + "norm1.weight"] = hf[p + "layernorm_before.weight"]
        sd[t + "norm1.bias"] = hf[p + "layernorm_before.bias"]
        sd[t + "norm2.weight"] = hf[p + "layernorm_after.weight"]
        sd[t + "norm2.bias"] = hf[p + "layernorm_after.bias"]
        # timm fuses qkv: cat along the output dim in q, k, v order.
        sd[t + "attn.qkv.weight"] = torch.cat(
            [hf[p + "attention.attention.query.weight"],
             hf[p + "attention.attention.key.weight"],
             hf[p + "attention.attention.value.weight"]], dim=0)
        sd[t + "attn.qkv.bias"] = torch.cat(
            [hf[p + "attention.attention.query.bias"],
             hf[p + "attention.attention.key.bias"],
             hf[p + "attention.attention.value.bias"]], dim=0)
        sd[t + "attn.proj.weight"] = hf[p + "attention.output.dense.weight"]
        sd[t + "attn.proj.bias"] = hf[p + "attention.output.dense.bias"]
        sd[t + "mlp.fc1.weight"] = hf[p + "intermediate.dense.weight"]
        sd[t + "mlp.fc1.bias"] = hf[p + "intermediate.dense.bias"]
        sd[t + "mlp.fc2.weight"] = hf[p + "output.dense.weight"]
        sd[t + "mlp.fc2.bias"] = hf[p + "output.dense.bias"]
        i += 1
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.slow
def test_convert_real_timm_layout_full_resolution():
    """Forward parity vs an INDEPENDENT torch DeiT at the real checkpoint
    layout, full DeiT-B/384 shapes, f32 (VERDICT r1 #3 acceptance)."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import DeiTConfig, DeiTForImageClassificationWithTeacher

    from fusiontransformer_tpu.models.vit import VisionTransformer2D
    from fusiontransformer_tpu.utils.torch_convert import convert_deit_to_vit2d

    torch.manual_seed(0)
    config = DeiTConfig(image_size=384, patch_size=16, hidden_size=768,
                        num_hidden_layers=12, num_attention_heads=12,
                        intermediate_size=3072, layer_norm_eps=1e-6,
                        hidden_act="gelu", num_labels=4)
    hf = DeiTForImageClassificationWithTeacher(config).eval()
    # Random init is ~N(0, 0.02) everywhere -> activations stay O(1) through
    # 12 blocks, a fair numerics regime for parity.
    sd = _hf_deit_to_timm_sd(hf)
    assert sd["pos_embed"].shape == (1, 578, 768)
    assert sd["blocks.0.attn.qkv.weight"].shape == (2304, 768)

    params = convert_deit_to_vit2d(sd)
    assert "head" not in params and "norm" not in params  # skipped keys

    img = np.random.RandomState(1).randn(1, 384, 384, 3).astype(np.float32)
    model = VisionTransformer2D(compute_dtype=jnp.float32)
    variables = {"params": params}
    outs = jax.jit(lambda v, x: model.apply(v, x))(variables, jnp.asarray(img))

    with torch.no_grad():
        hf_out = hf.deit(torch.from_numpy(img).permute(0, 3, 1, 2),
                         output_hidden_states=True)
    # hidden_states[i+1] is block i's output (pre final-norm residual
    # stream); strip the cls/dist tokens like forward_blocks does.
    for i in (0, 5, 11):
        ref = hf_out.hidden_states[i + 1][:, 2:, :].numpy()
        got = np.asarray(outs[str(i)])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
