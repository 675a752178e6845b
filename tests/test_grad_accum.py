"""Gradient accumulation (TRAIN.GRAD_ACCUM_STEPS, optax.MultiSteps wrap).

Beyond reference parity (SURVEY §2.3 lists no accumulation in the
reference); semantics pinned here: k micro-batches average into one inner
update, params are frozen between updates, and the per-epoch LR scheduler
(`set_learning_rate`) keeps working through the wrapper without retraces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.solver.build import (build_optimizer,
                                                get_learning_rate,
                                                set_learning_rate)


def _cfg(accum):
    cfg = get_default_cfg()
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-2
    cfg.OPTIMIZER.WEIGHT_DECAY = 0.0
    cfg.TRAIN.GRAD_ACCUM_STEPS = accum
    return cfg


def test_accumulated_update_matches_mean_grad_step():
    params = {"w": jnp.arange(4.0, dtype=jnp.float32)}
    g1 = {"w": jnp.asarray([1.0, -2.0, 0.5, 3.0], jnp.float32)}
    g2 = {"w": jnp.asarray([0.0, 4.0, -1.5, 1.0], jnp.float32)}

    tx, _ = build_optimizer(_cfg(2), steps_per_epoch=1)
    st = tx.init(params)

    up1, st = tx.update(g1, st, params)
    # micro-step 1 of 2: params must not move
    assert all(np.all(np.asarray(u) == 0) for u in jax.tree.leaves(up1))
    up2, st = tx.update(g2, st, params)

    # one plain (accum=1) step on the averaged gradient must match (up to
    # the f32 rounding of MultiSteps' incremental running mean vs (a+b)/2)
    tx1, _ = build_optimizer(_cfg(1), steps_per_epoch=1)
    st1 = tx1.init(params)
    gmean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    ref_up, _ = tx1.update(gmean, st1, params)

    np.testing.assert_allclose(np.asarray(up2["w"]), np.asarray(ref_up["w"]),
                               rtol=1e-6)


def test_lr_setter_descends_into_multisteps_state():
    params = {"w": jnp.ones((3,), jnp.float32)}
    tx, schedule = build_optimizer(_cfg(3), steps_per_epoch=2)
    st = tx.init(params)
    assert get_learning_rate(st) == np.float32(schedule(0))
    st = set_learning_rate(st, 0.5)
    assert get_learning_rate(st) == 0.5


def test_lr_update_keeps_jit_cache_with_accumulation():
    tx, schedule = build_optimizer(_cfg(2), steps_per_epoch=2)
    params = {"w": jnp.ones((4,), jnp.float32)}
    opt_state = tx.init(params)

    @jax.jit
    def step(opt_state, params):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return opt_state, optax.apply_updates(params, updates)

    opt_state, params = step(opt_state, params)
    n_traces = step._cache_size()
    opt_state = set_learning_rate(opt_state, schedule(2))
    opt_state, params = step(opt_state, params)
    assert step._cache_size() == n_traces, "LR update retraced the step"


@pytest.mark.slow
def test_trainer_step_accumulates(tmp_path):
    """Full jitted train step with accum=2: identical params after the odd
    micro-step, moved after the even one; metrics still report per-micro-
    batch losses."""
    from fusiontransformer_tpu.data.build import build_dataloader
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.modules.steps import (_device_batch,
                                                     make_train_step)

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.USE_LIDAR = True
    cfg.MODEL.USE_IMAGE = False
    cfg.MODEL.USE_FUSION = False
    cfg.MODEL.NUM_CLASSES = 20
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.SyntheticSCN.num_scans = 2
    cfg.DATASET.SyntheticSCN.num_points = 512
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.TRAIN.BATCH_SIZE = 1
    cfg.TRAIN.GRAD_ACCUM_STEPS = 2
    cfg.TPU.POINT_CAPACITY = 1024
    cfg.freeze()

    model = build_model(cfg)[0]
    tx, _ = build_optimizer(cfg, steps_per_epoch=1)
    state = init_train_state(cfg, model, tx, 1, rng_seed=0)
    step_fn, _ = make_train_step(cfg, model, tx, 1)
    step = jax.jit(step_fn)

    loader = build_dataloader(cfg, mode="train")
    batch = _device_batch(next(iter(loader)))

    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    p1 = jax.tree.map(np.asarray, state.params)
    same = jax.tree.map(lambda a, b: np.array_equal(a, b), p0, p1)
    assert all(jax.tree.leaves(same)), "params moved on micro-step 1 of 2"

    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    p2 = jax.tree.map(np.asarray, state.params)
    moved = jax.tree.map(lambda a, b: not np.array_equal(a, b), p1, p2)
    assert any(jax.tree.leaves(moved)), "params did not move on micro-step 2"
