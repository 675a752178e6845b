"""Host-built group-pooled slot maps (ops/host_slots.py): exactness vs the
device hierarchy + the grouped conv paths vs the dense 27-tap conv.

The grouped maps move slot compaction from the device (per-voxel K slots,
sized to the live-tap max) to the loader (slots pooled per 8-voxel kernel
group, exactly compacted) — the r5 ROADMAP swing.  These tests pin:
(a) the host Morton order/joins reproduce the device hierarchy's index
    space exactly (numerical equality of conv outputs is the oracle);
(b) grouped forward == dense forward, both XLA and Pallas-interpret;
(c) gradients (feats + weights) match the dense custom-VJP path;
(d) assembly handles multi-scan batches with non-8-aligned scan counts
    (groups spanning scan boundaries).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiontransformer_tpu.data.collate import collate_padded
from fusiontransformer_tpu.data.synthetic import SyntheticSCN
from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
from fusiontransformer_tpu.ops.host_slots import (build_batch_slot_maps,
                                                  morton36,
                                                  _coords_from_morton)

# Roomy at every level: the host/device map equivalence (like the rest of
# the production stack) holds on the zero-overflow domain — capacities are
# sized so nvalid_raw <= cap always (asserted below), exactly as the
# trainer's adaptive caps guarantee.
CAPS = (2560, 2560, 2560, 2560, 2560)


def _batch_and_hier(n_scans=2, n_points=1000, cap=1280):
    ds = SyntheticSCN(split=("train",), num_scans=n_scans,
                      num_points=n_points)
    samples = [ds[i] for i in range(n_scans)]
    batch = collate_padded(samples, n_scans, cap, 37, 61,
                           output_image=False)
    hier = jax.jit(lambda c, b, v: build_hierarchy(c, b, v, CAPS))(
        jnp.asarray(batch["coords"]), jnp.asarray(batch["pt_batch"]),
        jnp.asarray(batch["pt_valid"]))
    for l, lvl in enumerate(hier.levels):
        assert int(np.asarray(lvl.nvalid_raw)) <= CAPS[l], \
            f"test capacities overflow at level {l}"
    coords_list = [np.asarray(s["coords"][:cap]) for s in samples]
    return batch, hier, coords_list


def test_morton_roundtrip():
    rng = np.random.RandomState(0)
    c = rng.randint(0, 4096, size=(1000, 3)).astype(np.int64)
    key = morton36(c)
    back = _coords_from_morton(key)
    np.testing.assert_array_equal(back, c)
    # Order-preservation under halving: parent keys of a sorted key array
    # are sorted (the hierarchy invariant).
    ks = np.sort(key)
    assert (np.diff(ks >> 3) >= 0).all()


@pytest.mark.parametrize("level", [0, 1, 2])
def test_grouped_conv_matches_dense(level):
    """Grouped host maps reproduce the dense conv output exactly — which
    also proves the host index space matches the device hierarchy."""
    _, hier, coords_list = _batch_and_hier()
    maps, overflow = build_batch_slot_maps(coords_list, CAPS,
                                           slot_levels=[level])
    assert overflow == 0
    src_pack, bin_pack = (jnp.asarray(x) for x in maps[level])

    lvl = hier.levels[level]
    cap = CAPS[level]
    rng = np.random.RandomState(1 + level)
    feats = jnp.asarray(rng.randn(cap, 32).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(27, 32, 16).astype(np.float32))

    dense = sc._subm3(feats, w, lvl.nbr_idx, jnp.float32)
    grouped = sc._subm3gs(feats, w, src_pack, bin_pack, jnp.float32)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_grouped_conv_gradients_match_dense():
    _, hier, coords_list = _batch_and_hier()
    level = 1
    maps, _ = build_batch_slot_maps(coords_list, CAPS, slot_levels=[level])
    src_pack, bin_pack = (jnp.asarray(x) for x in maps[level])
    lvl = hier.levels[level]
    cap = CAPS[level]
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(cap, 16).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(27, 16, 16).astype(np.float32))
    cot = jnp.asarray(rng.randn(cap, 16).astype(np.float32))

    def f_dense(f, w):
        return jnp.vdot(sc._subm3(f, w, lvl.nbr_idx, jnp.float32), cot)

    def f_grouped(f, w):
        return jnp.vdot(
            sc._subm3gs(f, w, src_pack, bin_pack, jnp.float32), cot)

    gd = jax.grad(f_dense, argnums=(0, 1))(feats, w)
    gg = jax.grad(f_grouped, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gd[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-4)


def test_grouped_pallas_interpret_matches_xla():
    """The Pallas grouped kernel (interpret mode on CPU) == the XLA grouped
    formulation, forward and backward."""
    from fusiontransformer_tpu.ops.pallas.binned_conv import (
        binned_conv_bwd, binned_conv_fwd)

    _, hier, coords_list = _batch_and_hier()
    level = 1
    maps, _ = build_batch_slot_maps(coords_list, CAPS, slot_levels=[level])
    src_pack, bin_pack = (jnp.asarray(x) for x in maps[level])
    cap = CAPS[level]
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(cap, 32).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(27, 32, 32).astype(np.float32))

    ref = sc._subm3gs(feats, w, src_pack, bin_pack, jnp.float32)
    g = sc.pad_row(feats)[src_pack]
    out = binned_conv_fwd(g, bin_pack, w.reshape(27 * 32, 32),
                          precise=True, grouped=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    cot = jnp.asarray(rng.randn(cap, 32).astype(np.float32))
    gd = sc.pad_row(cot)[src_pack]
    dx, dw = binned_conv_bwd(gd, bin_pack, feats, w, precise=True,
                             grouped=True, interpret=True)
    ref_dx, ref_dw = jax.grad(
        lambda f, ww: jnp.vdot(
            sc._subm3gs(f, ww, src_pack, bin_pack, jnp.float32), cot),
        argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw),
                               rtol=1e-4, atol=1e-4)


def test_subm_conv3_routes_grouped_by_shape():
    """subm_conv3 discriminates grouped maps ([V/8, S]) from per-voxel maps
    ([V, K]) by shape and produces the dense answer for both."""
    _, hier, coords_list = _batch_and_hier()
    level = 2
    maps, _ = build_batch_slot_maps(coords_list, CAPS, slot_levels=[level])
    src_pack, bin_pack = (jnp.asarray(x) for x in maps[level])
    lvl = hier.levels[level]
    cap = CAPS[level]
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(cap, 16).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(27, 16, 16).astype(np.float32))

    dense = sc.subm_conv3(feats, w, lvl.nbr_idx, jnp.float32)
    grouped = sc.subm_conv3(feats, w, lvl.nbr_idx, jnp.float32,
                            slot_idx=(src_pack, bin_pack))
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_assembly_scan_boundary_groups():
    """Scans whose level counts are not multiples of 8 share pool groups at
    the boundary; the maps stay exact (the oracle is the dense conv)."""
    _, hier, coords_list = _batch_and_hier(n_scans=3, n_points=597)
    level = 0
    maps, overflow = build_batch_slot_maps(coords_list, CAPS,
                                           slot_levels=[level])
    assert overflow == 0
    src_pack, bin_pack = (jnp.asarray(x) for x in maps[level])
    lvl = hier.levels[level]
    cap = CAPS[level]
    rng = np.random.RandomState(11)
    feats = jnp.asarray(rng.randn(cap, 8).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(27, 8, 8).astype(np.float32))
    dense = sc._subm3(feats, w, lvl.nbr_idx, jnp.float32)
    grouped = sc._subm3gs(feats, w, src_pack, bin_pack, jnp.float32)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_slot_pool_spec_caps_match_steps():
    """SlotPoolSpec's jax-free capacity logic must equal the trainer's
    (steps.level_caps_for_n / adaptive_level_caps) — the worker-built map
    shapes and the jitted step shapes agree only through this equality."""
    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.modules.steps import (adaptive_level_caps,
                                                     level_caps_for_n)
    from fusiontransformer_tpu.ops.host_slots import SlotPoolSpec

    cfg = get_default_cfg()
    spec = SlotPoolSpec([0, 1, 2, 3], cfg.TPU.L0_CAPACITY_FRACTION,
                        cfg.TPU.LEVEL_CAPACITY_FRACTIONS, adaptive=True)
    rng = np.random.RandomState(0)
    for n_total in (2560, 20480, 61440, 163840):
        counts = rng.randint(1, n_total, size=spec.num_levels)
        assert spec.static_caps(n_total) == level_caps_for_n(cfg, n_total)
        assert spec.caps_for(n_total, counts) == \
            adaptive_level_caps(cfg, n_total, counts)


def test_collate_emits_grouped_slot_maps():
    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.ops.host_slots import SlotPoolSpec

    cfg = get_default_cfg()
    spec = SlotPoolSpec([0, 1, 2], cfg.TPU.L0_CAPACITY_FRACTION,
                        cfg.TPU.LEVEL_CAPACITY_FRACTIONS, adaptive=True)
    ds = SyntheticSCN(split=("train",), num_scans=2, num_points=500)
    batch = collate_padded([ds[i] for i in range(2)], 2, 640, 37, 61,
                           output_image=False,
                           level_counts=spec.num_levels, slot_pool=spec)
    assert batch["gslot_overflow"] == 0
    caps = spec.caps_for(2 * 640, batch["level_counts"])
    for l in (0, 1, 2):
        src, binp = batch[f"gslot_src_{l}"], batch[f"gslot_bin_{l}"]
        assert src.shape == binp.shape and src.shape[0] == caps[l] // 8
        assert src.shape[1] % spec.quantum == 0
        live = binp < 216
        # every live slot points at a real voxel; sentinels at cap
        assert (src[live] < caps[l]).all()
        assert (src[~live] == caps[l]).all()
        # bin ids are unique within a group (one row per (tap, voxel) bin)
        g, s = np.nonzero(live)
        pairs = g.astype(np.int64) * 216 + binp[live]
        assert len(np.unique(pairs)) == len(pairs)


@pytest.mark.slow
def test_trainer_end_to_end_with_slot_pool(tmp_path):
    """SemanticTrainer with TPU.CONV_SLOT_POOL on (single CPU device
    config): the loader emits grouped maps, the step consumes them (no
    device slot build), training + validation run, zero overflow."""
    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.modules.SemanticTrainer import SemanticTrainer

    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "LidarSeg"
    cfg.MODEL.NUM_CLASSES = 20
    cfg.MODEL.USE_LIDAR = True
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.TRAIN = ("train",)
    cfg.DATASET.VAL = ("val",)
    cfg.DATASET.SyntheticSCN.num_scans = 4
    cfg.DATASET.SyntheticSCN.num_points = 150
    cfg.DATASET.SyntheticSCN.image_width = 122
    cfg.DATASET.SyntheticSCN.image_height = 37
    cfg.OPTIMIZER.TYPE = "Adam"
    cfg.OPTIMIZER.BASE_LR = 1e-3
    cfg.SCHEDULER.MAX_EPOCH = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.VAL.BATCH_SIZE = 2
    cfg.VAL.PERIOD = 1
    cfg.TPU.POINT_CAPACITY = 320
    cfg.TPU.ADAPTIVE_LEVEL_CAPS = True
    cfg.TPU.CONV_SLOT_POOL = True
    cfg.TPU.NUM_DEVICES = 1     # the slot-pool gate needs the topology
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()

    trainer = SemanticTrainer(cfg, str(tmp_path), "slotpool_run")
    # the loader must actually emit grouped maps
    probe = next(iter(trainer.train_dataloader))
    assert "gslot_src_0" in probe and probe["gslot_overflow"] == 0
    trainer.train()
    assert trainer.train_metric_logger.meters["voxel_overflow"].global_avg \
        == 0.0
    loss = trainer.train_metric_logger.meters["seg_loss_3d"].global_avg
    assert np.isfinite(loss)
    assert "seg_iou_3d" in trainer.val_metric_logger.meters
