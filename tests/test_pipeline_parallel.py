"""Pipeline parallelism: GPipe-scheduled ViT == sequential ViT, fwd + grad.

Beyond-parity feature (the reference is DP-only, SURVEY §2.3): the DeiT
blocks run as stages over a ``pipe`` mesh axis with microbatched ppermute
hand-off (``parallel/pipeline_parallel.py``), validated on the virtual CPU
mesh like the DP/TP tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fusiontransformer_tpu.models.vit import VisionTransformer2D
from fusiontransformer_tpu.parallel import pipeline_parallel as pp_lib


def _vit(depth=4, dim=64, heads=4):
    return VisionTransformer2D(img_size=32, patch_size=16, embed_dim=dim,
                               depth=depth, num_heads=heads,
                               compute_dtype=jnp.float32)


def test_stack_unstack_roundtrip(rng):
    vit = _vit()
    imgs = jnp.zeros((1, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), imgs)["params"]
    staged, rest = pp_lib.stack_vit_blocks(params, n_stages=2)
    leaves = jax.tree_util.tree_leaves(staged)
    assert all(l.shape[:2] == (2, 2) for l in leaves)
    back = pp_lib.unstack_vit_blocks(staged, rest)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(back)[0]}
    for path, a in flat_a:
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(flat_b[jax.tree_util.keystr(path)]),
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 2), (2, 1)])
def test_pp_vit_forward_parity(rng, stages, micro):
    """All requested taps from the pipelined ViT match the sequential one."""
    vit = _vit(depth=4)
    b = max(2, micro)
    imgs = jnp.asarray(rng.standard_normal((b, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), imgs)["params"]
    ref = vit.apply({"params": params}, imgs)

    staged, rest = pp_lib.stack_vit_blocks(params, stages)
    mesh = pp_lib.make_pp_mesh(stages)
    taps = (0, 1, 3)
    fwd = pp_lib.make_pp_forward(vit, mesh, n_micro=micro, tap_blocks=taps)
    out = fwd(staged, rest, imgs)
    assert set(out.keys()) == {str(k) for k in taps}
    for k in out:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


@pytest.mark.slow
def test_pp_vit_grad_parity(rng):
    """Gradients through the pipeline match the sequential ViT: stage-local
    block grads reassemble to the full grads; embed/pos grads are replicated
    and full (the f/g collectives are placed correctly)."""
    stages, micro = 2, 2
    vit = _vit(depth=4)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), imgs)["params"]
    taps = (1, 3)

    def loss_full(p):
        out = vit.apply({"params": p}, imgs)
        return sum(jnp.sum(out[str(k)] ** 2) for k in taps)

    gref = jax.grad(loss_full)(params)
    gref_staged, gref_rest = pp_lib.stack_vit_blocks(gref, stages)

    staged, rest = pp_lib.stack_vit_blocks(params, stages)
    mesh = pp_lib.make_pp_mesh(stages)

    def loss_pp(staged, rest):
        out = pp_lib.pp_vit_apply(vit, staged, rest, imgs, stages, micro,
                                  taps)
        return sum(jnp.sum(out[str(k)] ** 2) for k in taps)

    def grads(staged, rest):
        return jax.grad(loss_pp, argnums=(0, 1))(staged, rest)

    g_staged, g_rest = jax.jit(jax.shard_map(
        grads, mesh=mesh, in_specs=(P("pipe"), P()),
        out_specs=(P("pipe"), P()), check_vma=False))(staged, rest)

    for got, want, name in ((g_staged, gref_staged, "blocks"),
                            (g_rest, gref_rest, "rest")):
        flat_want = jax.tree_util.tree_flatten_with_path(want)[0]
        flat_got = {jax.tree_util.keystr(p): v for p, v in
                    jax.tree_util.tree_flatten_with_path(got)[0]}
        for path, w in flat_want:
            g = flat_got[jax.tree_util.keystr(path)]
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4,
                err_msg=f"{name}:{jax.tree_util.keystr(path)}")
