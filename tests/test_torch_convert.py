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
