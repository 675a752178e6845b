"""SPVCNN smoke + invariance tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.models.lidar_model import LidarSeg
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

CAPS = (128, 128, 96, 64, 48)


def _scene(rng, n=55, cap=128, n_scans=2):
    coords = np.zeros((cap, 3), np.int32)
    batch = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    feats = np.zeros((cap, 4), np.float32)
    pos = 0
    for b in range(n_scans):
        pts = np.unique(rng.randint(0, 30, size=(n, 3)), axis=0)
        k = min(len(pts), cap - pos)
        pts = pts[:k]
        coords[pos:pos + k] = pts
        batch[pos:pos + k] = b
        valid[pos:pos + k] = True
        feats[pos:pos + k] = rng.randn(k, 4)
        pos += k
    return coords, batch, valid, feats


def test_lidarseg_forward_and_grads(rng):
    coords, batch, valid, feats = _scene(rng)
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS)
    model = LidarSeg(num_classes=20, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"feats": feats}, hier,
                           train=False)
    out = model.apply(variables, {"feats": feats}, hier, train=False)
    logit = out["lidar_seg_logit"]
    assert logit.shape == (128, 20)
    assert np.isfinite(np.asarray(logit)[valid]).all()

    # Every parameter receives gradient (reference test_dataset.py:33-46
    # "all params updated" pattern, made real).
    labels = rng.randint(1, 20, size=(128,))

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            {"feats": feats}, hier, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])[0]
        lg = out["lidar_seg_logit"]
        logp = jax.nn.log_softmax(lg, axis=-1)
        per = -jnp.take_along_axis(logp, jnp.asarray(labels)[:, None],
                                   axis=-1)[:, 0]
        return jnp.sum(per * valid) / valid.sum()

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    zero_grads = [
        path for path, g in
        jax.tree_util.tree_flatten_with_path(grads)[0]
        if not np.any(np.abs(np.asarray(g)) > 0)
    ]
    assert not zero_grads, f"params with zero grad: {zero_grads[:5]}"


def test_batch_independence(rng):
    """Scan b's logits must not depend on scan (1-b)'s features.

    This is the reference's aspirational batch-independence test
    (test_dataset.py:3-29) done properly: masked BN is excluded by running in
    eval mode with fixed stats.
    """
    coords, batch, valid, feats = _scene(rng)
    hier = jax.jit(build_hierarchy, static_argnums=(3, 4, 5))(
        coords, batch, valid, CAPS)
    model = LidarSeg(num_classes=20, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"feats": feats}, hier,
                           train=False)
    apply = jax.jit(lambda f: model.apply(variables, {"feats": f}, hier,
                                          train=False)["lidar_seg_logit"])
    base = np.asarray(apply(feats))
    feats2 = feats.copy()
    feats2[(batch == 1) & valid] += 10.0
    pert = np.asarray(apply(feats2))
    sel0 = (batch == 0) & valid
    np.testing.assert_allclose(base[sel0], pert[sel0], rtol=1e-5, atol=1e-5)
    sel1 = (batch == 1) & valid
    assert np.abs(base[sel1] - pert[sel1]).max() > 1e-3
