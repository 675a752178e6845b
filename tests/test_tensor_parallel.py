"""Tensor parallelism: TP-sharded ViT parity + 2-D (data, model) mesh step.

Beyond-parity feature (the reference is DP-only, SURVEY §2.3): Megatron-style
head/hidden sharding of the DeiT stream with explicit psum over a ``model``
mesh axis, validated on the 8-virtual-CPU mesh exactly like the DP tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from fusiontransformer_tpu.models.vit import VisionTransformer2D
from fusiontransformer_tpu.parallel import tensor_parallel as tp_lib


def _full_and_tp_models(tp, depth=2, heads=4, dim=64):
    full = VisionTransformer2D(img_size=32, patch_size=16, embed_dim=dim,
                               depth=depth, num_heads=heads,
                               compute_dtype=jnp.float32)
    local = VisionTransformer2D(img_size=32, patch_size=16, embed_dim=dim,
                                depth=depth, num_heads=heads, tp=tp,
                                tp_axis="model", compute_dtype=jnp.float32)
    return full, local


def test_split_rules_address_only_block_leaves(rng):
    full, _ = _full_and_tp_models(2)
    imgs = jnp.zeros((1, 32, 32, 3))
    params = full.init(jax.random.PRNGKey(0), imgs)["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rules = {jax.tree_util.keystr(p): tp_lib.tp_rule_for_path(p)
             for p, _ in flat}
    # Every block has qkv/proj/fc1/fc2 kernels addressed; LN + patch embed
    # + tokens replicated.
    assert any(v == "qkv_kernel" for v in rules.values())
    assert any(v == "row_kernel" for v in rules.values())
    assert any(v == "col_kernel" for v in rules.values())
    for k, v in rules.items():
        if "norm" in k or "patch_embed" in k or "pos_embed" in k \
                or "cls_token" in k or "dist_token" in k:
            assert v is None, (k, v)
        if "proj" in k and "bias" in k:
            assert v is None, (k, v)  # row-parallel bias is replicated


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_vit_forward_parity(rng, tp):
    """TP-sharded ViT == full ViT on the same (converted) weights."""
    full, local = _full_and_tp_models(tp)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = full.init(jax.random.PRNGKey(0), imgs)["params"]
    ref = full.apply({"params": params}, imgs)

    stacked = tp_lib.split_params_for_tp(params, tp, num_heads=4)
    mesh = Mesh(np.array(jax.devices()[:tp]).reshape(1, tp),
                ("data", "model"))
    specs = tp_lib.specs_for_tp(stacked)

    def fwd(p, imgs):
        return local.apply({"params": tp_lib.unstack_local(p)}, imgs)

    out = jax.jit(jax.shard_map(
        fwd, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False))(stacked, imgs)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_vit_grad_parity(rng):
    """Replicated-param grads under TP match the full model; TP-leaf grads
    reassemble to the full grads (the f/g conjugate pair is correct)."""
    tp = 2
    full, local = _full_and_tp_models(tp)
    imgs = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    params = full.init(jax.random.PRNGKey(0), imgs)["params"]

    def loss_full(p):
        out = full.apply({"params": p}, imgs)
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in out.values())

    gref = jax.grad(loss_full)(params)

    stacked = tp_lib.split_params_for_tp(params, tp, num_heads=4)
    mesh = Mesh(np.array(jax.devices()[:tp]).reshape(1, tp),
                ("data", "model"))
    specs = tp_lib.specs_for_tp(stacked)

    def loss_local(p):
        out = local.apply({"params": tp_lib.unstack_local(p)}, imgs)
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in out.values())

    def grads(p):
        # grad wrt the stacked-local tree keeps its [1, ...] rank axis,
        # so no restack is needed.
        return jax.grad(loss_local)(p)

    g = jax.jit(jax.shard_map(
        grads, mesh=mesh, in_specs=(specs,), out_specs=specs,
        check_vma=False))(stacked)

    gref_stacked = tp_lib.split_params_for_tp(gref, tp, num_heads=4)
    flat_ref = jax.tree_util.tree_flatten_with_path(gref_stacked)[0]
    flat_got = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_flatten_with_path(g)[0]}
    for path, ref_leaf in flat_ref:
        got = flat_got[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_leaf),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_split_merge_roundtrip(rng):
    """merge_params_from_tp inverts split_params_for_tp bit-exactly."""
    full, _ = _full_and_tp_models(2)
    imgs = jnp.zeros((1, 32, 32, 3))
    params = full.init(jax.random.PRNGKey(0), imgs)["params"]
    for tp in (2, 4):
        stacked = tp_lib.split_params_for_tp(params, tp, num_heads=4)
        merged = tp_lib.merge_params_from_tp(stacked, num_heads=4)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = {jax.tree_util.keystr(p): v for p, v in
                  jax.tree_util.tree_flatten_with_path(merged)[0]}
        for path, a in flat_a:
            b = flat_b[jax.tree_util.keystr(path)]
            assert a.shape == b.shape, (jax.tree_util.keystr(path), tp)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_tp_trainer_full_cycle(tmp_path):
    """DistributedTrainer with TPU.MODEL_PARALLEL=2 over a (2, 2) mesh:
    train epoch, merged-eval, canonical-layout checkpoint, test()."""
    import glob
    import os.path as osp

    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.modules.DistributedTrainer import (
        DistributedTrainer)

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "MiddleFusionTransformer"
    cfg.MODEL.USE_FUSION = True
    cfg.MODEL.USE_LIDAR = True
    cfg.MODEL.USE_IMAGE = True
    cfg.MODEL.DUAL_HEAD = True
    cfg.MODEL.middle_feat_block_number = 0
    cfg.MODEL.late_feat_block_number = 1
    cfg.MODEL.VIT_IMG_SIZE = 64
    cfg.MODEL.VIT_PATCH = 16
    cfg.MODEL.VIT_EMBED_DIM = 64
    cfg.MODEL.VIT_DEPTH = 2
    cfg.MODEL.VIT_HEADS = 4
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.TEST = ("test",)
    cfg.DATASET.SyntheticSCN.num_scans = 2
    cfg.DATASET.SyntheticSCN.num_points = 200
    cfg.DATASET.SyntheticSCN.image_width = 61
    cfg.DATASET.SyntheticSCN.image_height = 37
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.SCHEDULER.MAX_EPOCH = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.FusionTransformer.lambda_xm = 0.1
    cfg.VAL.BATCH_SIZE = 2
    cfg.VAL.PERIOD = 1
    cfg.TEST.BATCH_SIZE = 2
    cfg.TPU.POINT_CAPACITY = 256
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NUM_DEVICES = 4
    cfg.TPU.MODEL_PARALLEL = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()

    trainer = DistributedTrainer(cfg, str(tmp_path), "tp_run")
    assert trainer.mesh.devices.shape == (2, 2)
    assert trainer.mesh.axis_names == ("data", "model")
    trainer.train()

    # Validation ran on merged params.
    assert "seg_iou_3d" in trainer.val_metric_logger.meters

    # The best-IoU checkpoint stores the CANONICAL tp=1 layout.
    saved = sorted(glob.glob(osp.join(str(tmp_path), "max-MeanIoU-*.ckpt")))
    assert saved, "no best-IoU checkpoint written"
    from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2
    payload = CheckpointerV2(save_dir=str(tmp_path)).load(saved[-1],
                                                          resume=False)
    qkv = payload["params"]["image_backbone"]["backbone"]["block0"][
        "attn"]["qkv"]["kernel"]
    assert np.asarray(qkv).shape == (64, 3 * 64), np.asarray(qkv).shape

    # test() restores the canonical checkpoint and evaluates.
    metric_logger = trainer.test(save_predictions=False)
    assert "seg_iou_3d" in metric_logger.meters


@pytest.mark.slow
def test_dp_tp_train_step(rng):
    """Full flagship train step over a (data=2, model=2) mesh: runs, loss
    finite, TP leaves stay sharded, replicated leaves stay replicated.

    (2x2, not 4x2: XLA:CPU's in-process collective rendezvous has a
    hard-coded 40 s termination timeout, and this host's single core cannot
    reliably schedule 8 device threads through the ~24 per-step model-axis
    psums in time.  Real ICI collectives have no such constraint.)
    """
    from __graft_entry__ import _make_batch, _tiny_cfg, _tiny_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.modules.steps import make_train_step
    from fusiontransformer_tpu.solver.build import build_optimizer

    data, model_ranks = 2, 2
    cfg = _tiny_cfg(batch_size=data, point_capacity=256, img_h=37, img_w=61)
    model = _tiny_model(cfg, vit_depth=2)
    model_tp = _tiny_model(cfg, vit_depth=2, tp=model_ranks, tp_axis="model")

    tx, _ = build_optimizer(cfg, steps_per_epoch=1)
    state = init_train_state(cfg, model, tx, 1, rng_seed=0)
    heads = 4  # _tiny_model vit_heads
    state = state._replace(
        params=tp_lib.split_params_for_tp(state.params, model_ranks, heads),
        opt_state=tp_lib.split_params_for_tp(state.opt_state, model_ranks,
                                             heads))

    mesh = tp_lib.make_mesh_2d(data, model_ranks)
    step_fn, _ = make_train_step(cfg, model_tp, tx, 1, axis_name="data")
    train_step = tp_lib.shard_train_step_2d(step_fn, mesh,
                                            scans_per_device=1)

    batch = _make_batch(cfg, data)
    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    loss = float(np.asarray(metrics["total_loss"]))
    assert np.isfinite(loss), loss
    # TP leaves keep their stacked rank axis; the two rank shards differ.
    flat = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    qkv = [v for p, v in flat
           if tp_lib.tp_rule_for_path(p) == "qkv_kernel"]
    assert qkv and all(v.shape[0] == model_ranks for v in qkv)


def test_place_state_and_host_canonical_roundtrip(rng):
    """place_state puts stacked TP leaves on the model axis; host_canonical
    reassembles the canonical tp=1 layout from addressable shards without
    collectives (the multi-host rank-0 checkpoint-saver path, exercised
    single-process here and across 2 real processes in
    test_multihost_launcher.py)."""
    full, _ = _full_and_tp_models(tp=2)
    imgs = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    params = full.init(jax.random.PRNGKey(0), imgs)["params"]

    split = tp_lib.split_params_for_tp(params, 2, 4)
    mesh = tp_lib.make_mesh_2d(2, 2)
    placed = tp_lib.place_state(split, mesh)

    # TP leaves are sharded over 'model', replicated leaves over nothing.
    flat = jax.tree_util.tree_flatten_with_path(placed)[0]
    for path, leaf in flat:
        spec = leaf.sharding.spec
        if tp_lib.tp_rule_for_path(path) is not None:
            assert spec[0] == "model", (path, spec)
        else:
            assert all(s is None for s in spec), (path, spec)

    merged = tp_lib.host_canonical(placed, num_heads=4)
    ref = jax.tree_util.tree_map(np.asarray, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        merged, ref)
