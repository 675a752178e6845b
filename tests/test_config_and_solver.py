"""Fast unit tests: config merging, schedules, checkpoint GC, meters."""

import glob
import os.path as osp

import numpy as np
import pytest

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.utils.config import purge_cfg

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.parametrize("path", sorted(
    glob.glob(osp.join(REPO, "configs", "semantic_kitti", "*.yaml"))))
def test_all_configs_merge_and_build(path):
    cfg = get_default_cfg()
    cfg.merge_from_file(path)
    cfg.merge_from_list(["OPTIMIZER.BASE_LR", "0.01", "TRAIN.BATCH_SIZE", "2"])
    purge_cfg(cfg)
    cfg.freeze()
    assert cfg.OPTIMIZER.BASE_LR == 0.01
    assert cfg.TRAIN.BATCH_SIZE == 2
    assert cfg.MODEL.TYPE
    # purge removed inactive TYPE-keyed siblings
    assert set(k for k, v in cfg.DATASET.items()
               if isinstance(v, dict)) <= {cfg.DATASET.TYPE}
    from fusiontransformer_tpu.models.build import build_model
    built = build_model(cfg)
    assert built[0] is not None


def test_frozen_cfg_rejects_mutation():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.RNG_SEED = 7
    clone = cfg.clone()
    clone.RNG_SEED = 7  # clones are defrosted
    assert clone.RNG_SEED == 7 and cfg.RNG_SEED == 1


def test_tuple_literal_decoding(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text('DATASET:\n  TRAIN: ("train",)\n  TYPE: "SyntheticSCN"\n')
    cfg = get_default_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.DATASET.TRAIN == ("train",)


def test_lr_schedules_torch_parity():
    from fusiontransformer_tpu.solver.build import make_lr_schedule

    cfg = get_default_cfg()
    cfg.OPTIMIZER.BASE_LR = 1.0
    cfg.SCHEDULER.TYPE = "StepLR"
    cfg.SCHEDULER.StepLR.step_size = 10
    cfg.SCHEDULER.StepLR.gamma = 0.1
    s = make_lr_schedule(cfg, steps_per_epoch=5)
    assert s(0) == 1.0
    assert s(5 * 10) == pytest.approx(0.1)
    assert s(5 * 25) == pytest.approx(0.01)

    cfg2 = get_default_cfg()
    cfg2.OPTIMIZER.BASE_LR = 1.0
    cfg2.SCHEDULER.TYPE = "MultiStepLR"
    cfg2.SCHEDULER.MultiStepLR.milestones = (3, 7)
    cfg2.SCHEDULER.CLIP_LR = 0.05
    s2 = make_lr_schedule(cfg2, steps_per_epoch=1)
    assert s2(0) == 1.0
    assert s2(3) == pytest.approx(0.1)
    assert s2(7) == pytest.approx(0.05)  # 0.01 clipped to CLIP_LR


def test_set_learning_rate_keeps_jit_cache():
    """The per-epoch LR update must not change the opt_state leaf's abstract
    type (dtype/weak_type): a raw python float here retraces the full train
    step at every epoch boundary (reference scheduler semantics are per-epoch,
    SemanticTrainer.py:216-218)."""
    import jax
    import jax.numpy as jnp
    import optax

    from fusiontransformer_tpu.solver.build import (build_optimizer,
                                                    set_learning_rate)

    cfg = get_default_cfg()
    cfg.OPTIMIZER.TYPE = "Adam"
    tx, schedule = build_optimizer(cfg, steps_per_epoch=2)
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


def test_checkpointer_gc_and_manifest(tmp_path):
    import numpy as np

    from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2

    ck = CheckpointerV2(save_dir=str(tmp_path), max_to_keep=2)
    for e in range(4):
        ck.save(f"model{e:06d}", tree={"w": np.full((3,), float(e))},
                epoch=e)
    kept = sorted(p for p in tmp_path.iterdir() if p.suffix == ".ckpt")
    assert len(kept) == 2
    assert ck.get_checkpoint_file().endswith("model000003.ckpt")
    payload = CheckpointerV2(save_dir=str(tmp_path)).load(resume=True)
    assert int(payload["epoch"]) == 3
    np.testing.assert_allclose(payload["w"], 3.0)
    # resume_states=False drops optimizer state and epoch
    payload2 = CheckpointerV2(save_dir=str(tmp_path)).load(
        resume=True, resume_states=False)
    assert "epoch" not in payload2


def test_async_checkpointer(tmp_path):
    """async_save: writes land on a background thread; wait()/load()/
    has_checkpoint() join it, GC + manifest ordering match the sync path."""
    import numpy as np

    from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2

    ck = CheckpointerV2(save_dir=str(tmp_path), max_to_keep=2,
                        async_save=True)
    for e in range(4):
        ck.save(f"model{e:06d}", tree={"w": np.full((3,), float(e))},
                epoch=e)
    assert ck.has_checkpoint()       # joins the in-flight write
    kept = sorted(p for p in tmp_path.iterdir() if p.suffix == ".ckpt")
    assert len(kept) == 2
    assert ck.get_checkpoint_file().endswith("model000003.ckpt")
    payload = CheckpointerV2(save_dir=str(tmp_path)).load(resume=True)
    assert int(payload["epoch"]) == 3
    np.testing.assert_allclose(payload["w"], 3.0)


def test_metric_logger_and_segiou(rng):
    from fusiontransformer_tpu.models.metric import SegIoU
    from fusiontransformer_tpu.utils.metric_logger import MetricLogger

    ml = MetricLogger(delimiter="  ")
    ml.update(loss=1.0)
    ml.update(loss=3.0)
    assert ml.meters["loss"].global_avg == pytest.approx(2.0)
    assert "loss" in str(ml)

    m = SegIoU(num_classes=4, name="seg_iou_3d")
    cm = np.array([[0, 0, 0, 0],
                   [0, 5, 0, 0],
                   [0, 0, 3, 1],
                   [0, 0, 1, 3]], np.int64)
    m.update_matrix(cm)
    ious = m.iou
    assert ious[1] == pytest.approx(1.0)
    assert ious[2] == pytest.approx(3 / 5)


def test_callbacks_meaniou(rng):
    from fusiontransformer_tpu.modules.callbacks import AccEval, IoUEval, MeanIoU

    m = MeanIoU(num_classes=4, ignore_label=0,
                class_names=["a", "b", "c", "d"])
    targets = np.array([1, 1, 2, 2, 3, 0])
    outputs = np.array([1, 2, 2, 2, 3, 1])
    m.after_step({"outputs": outputs, "targets": targets})
    ious = m.ious
    assert ious[1] == pytest.approx(1 / 2)   # 1 correct / (2 seen + 2 pos - 1)
    assert ious[3] == pytest.approx(1.0)

    ie = IoUEval(n_classes=4)
    ie.after_step({"outputs": outputs, "targets": targets})
    miou, _ = ie.after_epoch()
    assert 0 < miou <= 1
    ae = AccEval(n_classes=4)
    ae.after_step({"outputs": outputs, "targets": targets})
    assert 0 < ae.after_epoch() <= 1
