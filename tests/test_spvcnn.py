"""SPVCNN smoke + invariance tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.models.lidar_model import LidarSeg
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
import pytest

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
    # Deliberately UNMARKED (quick tier): the only SPVCNN/LidarSeg model
    # coverage in the quick gate — forward + the all-params-updated grad
    # check.  ~80 s of CPU compile, paid so bash test.sh still catches
    # regressions in the flagship 3D path (advisor r3).
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_train_step_with_tap_slots(rng):
    """Full train step with compact conv slots: finite loss, tap_overflow
    metric present and zero at covering K."""
    import jax
    import optax

    from fusiontransformer_tpu.data.build import build_dataloader
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.modules.steps import (_device_batch,
                                                     make_train_step)
    from fusiontransformer_tpu.train import load_cfg
    import os

    cfg = load_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                                "semantic_kitti", "synthetic.yaml"),
                   ["TPU.POINT_CAPACITY", "1024",
                    "TPU.CONV_TAP_SLOTS", "(16, 16, 16, 16, 16)",
                    "DATASET.SyntheticSCN.num_scans", "2",
                    "DATASET.SyntheticSCN.num_points", "800",
                    "DATASET.SyntheticSCN.image_height", "48",
                    "DATASET.SyntheticSCN.image_width", "64",
                    "TRAIN.BATCH_SIZE", "2"])
    model = build_model(cfg)[0]
    tx = optax.adam(1e-4)
    state = init_train_state(cfg, model, tx, 2)
    step, _ = make_train_step(cfg, model, tx, 2)
    batch = _device_batch(next(iter(build_dataloader(cfg, mode="train"))))
    _, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(np.asarray(metrics["tap_overflow"])) == 0
