"""End-to-end training smoke test on the synthetic dataset (tiny, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiontransformer_tpu.config.defaults import get_default_cfg


def _tiny_cfg(tmp_path, model_type="LidarSeg"):
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = model_type
    cfg.MODEL.NUM_CLASSES = 20
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.TEST = ("test",)
    cfg.DATASET.SyntheticSCN.num_scans = 4
    cfg.DATASET.SyntheticSCN.num_points = 300
    cfg.DATASET.SyntheticSCN.image_width = 122
    cfg.DATASET.SyntheticSCN.image_height = 37
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.OPTIMIZER.WEIGHT_DECAY = 5e-4
    cfg.SCHEDULER.MAX_EPOCH = 2
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.VAL.BATCH_SIZE = 2
    cfg.VAL.PERIOD = 1
    cfg.TPU.POINT_CAPACITY = 320
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # exercise the weight+grad histogram path (TFEventWriter parity)
    cfg.TRAIN.LOG_HISTOGRAM = True
    cfg.TRAIN.SUMMARY_PERIOD = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()
    return cfg


@pytest.mark.slow
def test_lidar_train_val_checkpoint_resume(tmp_path):
    from fusiontransformer_tpu.modules.SemanticTrainer import SemanticTrainer

    cfg = _tiny_cfg(tmp_path)
    trainer = SemanticTrainer(cfg, str(tmp_path), "testrun")
    trainer.train()

    # Validation ran and produced a finite IoU meter.
    assert "seg_iou_3d" in trainer.val_metric_logger.meters
    iou = trainer.val_metric_logger.meters["seg_iou_3d"].global_avg
    assert 0.0 <= iou <= 1.0

    # Loss is finite and decreased across the (short) run.
    loss = trainer.train_metric_logger.meters["seg_loss_3d"].global_avg
    assert np.isfinite(loss)

    # A checkpoint was written on the best epoch and resume restores it.
    assert trainer.checkpointer.has_checkpoint()
    trainer2 = SemanticTrainer(cfg, str(tmp_path), "testrun2")
    assert trainer2.start_epoch >= 1
    from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2
    payload = CheckpointerV2(save_dir=str(tmp_path)).load(resume=True)
    p1 = payload["params"]["backbone"]["stem0"]["kernel"]
    p2 = trainer2.state.params["backbone"]["stem0"]["kernel"]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


@pytest.mark.slow
def test_nonfinite_loss_fails_fast(tmp_path):
    """Failure detection survives the deferred (one-step-late) metric
    readback: a poisoned-parameter run must still raise FloatingPointError
    from within the epoch, with state intact (SemanticTrainer.py fail-fast)."""
    import pytest

    from fusiontransformer_tpu.modules.SemanticTrainer import SemanticTrainer

    cfg = _tiny_cfg(tmp_path)
    trainer = SemanticTrainer(cfg, str(tmp_path), "nanrun")
    trainer.state = trainer.state._replace(
        params=jax.tree.map(lambda p: jnp.full_like(p, jnp.nan),
                            trainer.state.params))
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        trainer.train_for_one_epoch(0)


@pytest.mark.slow
def test_training_is_bitwise_deterministic(tmp_path):
    """Same RNG_SEED => bitwise-identical params after training.  This is
    the TPU-world replacement for the reference's cudnn.deterministic
    toggles (common/utils/torch_util.py:14-15): explicit PRNG keys + jit
    make the whole train loop (init, augmentation, dropout, shuffling) a
    pure function of the seed."""
    from fusiontransformer_tpu.modules.SemanticTrainer import SemanticTrainer

    leaves = []
    for sub in ("a", "b"):
        out = tmp_path / sub
        out.mkdir()
        cfg = _tiny_cfg(out)
        trainer = SemanticTrainer(cfg, str(out), f"det_{sub}")
        trainer.train()
        leaves.append(jax.tree.leaves(trainer.state.params))
    assert len(leaves[0]) == len(leaves[1])
    for p, q in zip(*leaves):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(q))
