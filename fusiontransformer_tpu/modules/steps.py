"""Jitted train/eval step builders.

The reference computes losses inline in ``SemanticTrainer.train_step``
(``modules/SemanticTrainer.py:141-209``) with two backward passes
(``:197-200``).  Because image features are detached before fusion and the KL
teachers are detached, the parameter gradient of (loss_2d + loss_3d) is
*identical* to the reference's accumulated double backward, so the TPU step
optimizes the single summed loss — one jitted program per step: hierarchy
build (int ops) -> forward -> losses -> grads -> optax update -> confusion
matrices, all fused by XLA.

``axis_name`` turns the same step into the data-parallel step: gradients,
losses and confusion matrices are ``lax.pmean``/``psum``'d over the mesh
(replacing DDP's NCCL allreduce, ``TorchpackInterface.py:78-81``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from fusiontransformer_tpu.models.losses import (kl_divergence,
                                                 weighted_cross_entropy)
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy


def frozen_mask_fn(frozen_patterns):
    """Zero gradients whose param path matches any regex
    (TRAIN.FROZEN_PATTERNS, reference ``common/config/base.py:92``)."""
    import re

    regexes = [re.compile(p) for p in frozen_patterns]

    def mask(grads):
        def path_str(path):
            return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)

        def maybe_zero(path, g):
            if any(r.search(path_str(path)) for r in regexes):
                return jnp.zeros_like(g)
            return g

        flat = jax.tree_util.tree_flatten_with_path(grads)
        leaves = [maybe_zero(p, g) for p, g in flat[0]]
        return jax.tree_util.tree_unflatten(flat[1], leaves)

    return mask


class StepCache:
    """LRU cache for per-capacity jitted steps (TPU.STEP_CACHE_SIZE).

    Each live compiled step retains ~1-1.2 GB of host memory on this stack
    (ROADMAP r5 leak diagnosis), and the adaptive-caps/slot-pool ladders
    mint a slow trickle of new tuples over a long run — unbounded caching
    is the dominant long-run RSS driver.  Evicting drops the executable
    (GC frees it); a re-hit re-traces, which the persistent XLA compile
    cache turns into a seconds-cheap disk load instead of a cold compile.
    maxsize <= 0 disables eviction.
    """

    def __init__(self, maxsize=16):
        from collections import OrderedDict
        self.maxsize = int(maxsize)
        self._d = OrderedDict()

    def get(self, key):
        fn = self._d.get(key)
        if fn is not None:
            self._d.move_to_end(key)
        return fn

    def __setitem__(self, key, fn):
        self._d[key] = fn
        self._d.move_to_end(key)
        if self.maxsize > 0:
            while len(self._d) > self.maxsize:
                self._d.popitem(last=False)

    def __len__(self):
        return len(self._d)

    def __bool__(self):
        return bool(self._d)

    def __iter__(self):
        return iter(self._d)


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: object
    step: jnp.ndarray


def level_caps_for_n(cfg, n_total: int):
    """Voxel capacities per level for a batch whose point buffer holds
    ``n_total`` rows.  Deriving this from the BATCH SHAPE (a trace-time
    constant) rather than the config makes capacity bucketing free: the
    collate picks a bucket-sized buffer per batch and jax.jit retraces once
    per bucket (SURVEY §7's static-shape bucketing north star)."""
    # L0 voxels are 1:1 with valid points; the point buffer carries padding
    # headroom that the voxel arrays don't need (invalid points sort to the
    # tail, so level 0 is a slice).  L1+ chain off the previous level's cap.
    caps = [min(n_total,
                max(128, int(round(n_total * cfg.TPU.L0_CAPACITY_FRACTION
                                   / 128.0)) * 128))]
    for frac in cfg.TPU.LEVEL_CAPACITY_FRACTIONS:
        nxt = max(128, int(round(caps[-1] * frac / 128.0)) * 128)
        caps.append(nxt)
    return tuple(caps)


def level_caps_from_cfg(cfg, batch_size: int):
    """Capacities at the full (largest-bucket) point buffer."""
    return level_caps_for_n(cfg, batch_size * cfg.TPU.POINT_CAPACITY)


def _ladder_cap(count: int) -> int:
    """Smallest ladder capacity >= count: 128-multiples on a ~1.25x
    geometric grid, so retraces stay a handful per run while capacity
    tracks occupancy within ~25%."""
    n = max(1, -(-int(count) // 128))
    lad = 1
    while lad < n:
        lad = max(lad + 1, int(lad * 1.25))
    return lad * 128


def adaptive_level_caps(cfg, n_total: int, level_counts):
    """Occupancy-compacted capacities (TPU.ADAPTIVE_LEVEL_CAPS): the exact
    per-level unique-voxel counts the collate measured, rounded up the
    ladder; the shape-derived static caps stay as a ceiling.  Gathers and
    GEMMs scale with capacity, so this sizes every level to the batch's
    data instead of the config's worst case (reference torchsparse sizes
    its buffers dynamically per scan — this is the static-shape analog)."""
    static = level_caps_for_n(cfg, n_total)
    return tuple(min(s, _ladder_cap(c))
                 for s, c in zip(static, list(level_counts)))



def norm_tap_slots(cfg, num_levels: int):
    """cfg.TPU.CONV_TAP_SLOTS normalized to the hierarchy depth: levels past
    the tuple run dense (zero-padded), extra entries are dropped (legacy
    configs carry deeper LEVEL_CAPACITY_FRACTIONS ladders).  () when the
    K-slot path is disabled everywhere."""
    ts = tuple(cfg.TPU.CONV_TAP_SLOTS) if "CONV_TAP_SLOTS" in cfg.TPU else ()
    if not ts or not any(ts):
        return ()
    return (ts + (0,) * num_levels)[:num_levels]


def _hier_from_cfg(cfg, batch, level_caps=None):
    """Hierarchy sized from the batch's (static) buffer — or from explicit
    occupancy-compacted capacities — with the cfg's compact conv-tap slots
    when enabled.

    Host-built group-pooled slot maps (``ops.host_slots``, the r5 swing):
    when the batch carries ``gslot_src_{l}``/``gslot_bin_{l}`` arrays, the
    device-side per-voxel slot compaction is skipped entirely and the
    loader's exactly-compacted pool maps are attached instead (the conv
    routes on their [V/8, S] shape — see ``sparse_conv.subm_conv3``)."""
    caps = level_caps or level_caps_for_n(cfg, batch["coords"].shape[0])
    if "gslot_src_0" in batch:
        from fusiontransformer_tpu.ops.hierarchy import attach_grouped_slots
        hier = build_hierarchy(batch["coords"], batch["pt_batch"],
                               batch["pt_valid"], caps)
        return attach_grouped_slots(hier, batch)
    return build_hierarchy(
        batch["coords"], batch["pt_batch"], batch["pt_valid"],
        caps, tap_slots=norm_tap_slots(cfg, len(caps)))


def _set_conv_backend(cfg):
    """Route K-slot ks=3 convs to the fused Pallas kernel when configured
    (trace-time switch; see sparse_conv.set_slot_backend)."""
    from fusiontransformer_tpu.ops import sparse_conv as sc
    pallas = bool(cfg.TPU.CONV_PALLAS) if "CONV_PALLAS" in cfg.TPU else False
    sc.set_slot_backend("pallas" if pallas else "xla")


def tap_overflow(hier, tap_slots):
    """Live ks3 taps dropped by the compact K-slot conv maps (0 = lossless,
    like voxel_overflow for capacities)."""
    total = 0
    for lvl, k in zip(hier.levels, tap_slots):
        if not k:
            continue
        cap = lvl.valid.shape[0]
        live = jnp.sum((lvl.nbr_idx < cap).astype(jnp.int32), axis=1)
        total += jnp.sum(jnp.maximum(live - k, 0))
    return total


def _losses(cfg, out, batch, class_weights):
    """Reference SemanticTrainer loss semantics (CE + lambda*KL per stream)."""
    valid = batch["pt_valid"]
    label = batch["seg_label"]
    aux = {}
    total = 0.0
    lam = cfg.TRAIN.FusionTransformer.lambda_xm
    if cfg.MODEL.USE_FUSION:
        loss_3d = weighted_cross_entropy(out["lidar_seg_logit"], label, valid,
                                         class_weights)
        loss_2d = weighted_cross_entropy(out["img_seg_logit"], label, valid,
                                         class_weights)
        aux["seg_loss_3d"] = loss_3d
        aux["seg_loss_2d"] = loss_2d
        if lam > 0:
            logit_2d = out["img_seg_logit2"] if cfg.MODEL.DUAL_HEAD else out[
                "img_seg_logit"]
            logit_3d = out["lidar_seg_logit2"] if cfg.MODEL.DUAL_HEAD else out[
                "lidar_seg_logit"]
            xm_2d = kl_divergence(logit_2d, out["lidar_seg_logit"], valid)
            xm_3d = kl_divergence(logit_3d, out["img_seg_logit"], valid)
            aux["xm_loss_2d"] = xm_2d
            aux["xm_loss_3d"] = xm_3d
            loss_2d = loss_2d + lam * xm_2d
            loss_3d = loss_3d + lam * xm_3d
        total = loss_2d + loss_3d
    elif cfg.MODEL.USE_LIDAR:
        loss_3d = weighted_cross_entropy(out["lidar_seg_logit"], label, valid,
                                         class_weights)
        aux["seg_loss_3d"] = loss_3d
        total = loss_3d
    elif cfg.MODEL.USE_IMAGE:
        loss_2d = weighted_cross_entropy(out["img_seg_logit"], label, valid,
                                         class_weights)
        aux["seg_loss_2d"] = loss_2d
        total = loss_2d
    return total, aux


def _confusions(cfg, out, batch):
    from fusiontransformer_tpu.models.metric import \
        confusion_matrix_from_logits
    cms = {}
    n = cfg.MODEL.NUM_CLASSES
    valid = batch["pt_valid"]
    if cfg.MODEL.USE_LIDAR:
        cms["cm_3d"] = confusion_matrix_from_logits(
            out["lidar_seg_logit"], batch["seg_label"], valid, n)
    if cfg.MODEL.USE_IMAGE:
        cms["cm_2d"] = confusion_matrix_from_logits(
            out["img_seg_logit"], batch["seg_label"], valid, n)
    return cms


def _device_batch(batch):
    """Array-only view of a collated batch (host lists stripped); host-built
    grouped slot maps (``gslot_src_*``/``gslot_bin_*``) ride along."""
    keys = ("coords", "feats", "seg_label", "pt_batch", "pt_valid", "img",
            "img_indices")
    out = {k: batch[k] for k in keys if k in batch}
    out.update({k: v for k, v in batch.items()
                if k.startswith(("gslot_src_", "gslot_bin_"))})
    return out


def make_train_step(cfg, model, tx, batch_size: int,
                    axis_name: Optional[str] = None, level_caps=None):
    _set_conv_backend(cfg)
    caps = level_caps or level_caps_from_cfg(cfg, batch_size)
    class_weights = (jnp.asarray(cfg.TRAIN.CLASS_WEIGHTS, jnp.float32)
                     if cfg.TRAIN.CLASS_WEIGHTS else None)
    use_lidar = cfg.MODEL.USE_LIDAR
    frozen = (frozen_mask_fn(cfg.TRAIN.FROZEN_PATTERNS)
              if cfg.TRAIN.FROZEN_PATTERNS else None)

    def step(state: TrainState, batch, rng):
        # Capacities follow the batch's (static) buffer size, so bucketed
        # batches each get right-sized voxel arrays via one retrace/bucket;
        # with TPU.ADAPTIVE_LEVEL_CAPS the trainer passes exact
        # occupancy-compacted capacities instead.
        hier = (_hier_from_cfg(cfg, batch, level_caps)
                if use_lidar else None)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, hier, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            total, aux = _losses(cfg, out, batch, class_weights)
            return total, (mut["batch_stats"], out, aux)

        (total, (new_bs, out, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if frozen is not None:
            grads = frozen(grads)

        metrics = dict(aux, total_loss=total)
        if hier is not None:
            # Static-capacity health check: total voxels dropped by level caps.
            metrics["voxel_overflow"] = sum(
                jnp.maximum(l.nvalid_raw - l.valid.shape[0], 0)
                for l in hier.levels)
            ts = norm_tap_slots(cfg, len(hier.levels))
            if any(ts) and "gslot_src_0" not in batch:
                # Host-built grouped maps are exactly compacted (the loader
                # counts and sizes the pool; its overflow counter covers
                # truncation) — the per-voxel K accounting doesn't apply.
                metrics["tap_overflow"] = tap_overflow(hier, ts)
        cms = _confusions(cfg, out, batch)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
            cms = jax.lax.psum(cms, axis_name)
        metrics.update(cms)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_bs, opt_state, state.step + 1), metrics

    return step, caps


def make_grads_fn(cfg, model, batch_size: int):
    """Gradients-only pass for TB grad histograms (reference
    ``TorchpackCallbacks.py:289-301`` logs weight AND grad histograms).
    Compiled lazily and run once per summary period, so the extra
    forward/backward does not tax the train loop."""
    class_weights = (jnp.asarray(cfg.TRAIN.CLASS_WEIGHTS, jnp.float32)
                     if cfg.TRAIN.CLASS_WEIGHTS else None)
    use_lidar = cfg.MODEL.USE_LIDAR

    def grads(state: TrainState, batch, rng):
        hier = _hier_from_cfg(cfg, batch) if use_lidar else None

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, hier, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            total, _ = _losses(cfg, out, batch, class_weights)
            return total

        return jax.grad(loss_fn)(state.params)

    return grads


def make_eval_step(cfg, model, batch_size: int,
                   axis_name: Optional[str] = None, level_caps=None):
    """Eval step: per-point predictions + losses (+ ensemble for fusion).

    Softmax-sum 2D+3D ensemble parity with ``data/utils/validate.py:67-70``.
    """
    _set_conv_backend(cfg)
    caps = level_caps or level_caps_from_cfg(cfg, batch_size)
    class_weights = (jnp.asarray(cfg.TRAIN.CLASS_WEIGHTS, jnp.float32)
                     if cfg.TRAIN.CLASS_WEIGHTS else None)
    use_lidar = cfg.MODEL.USE_LIDAR

    def step(state: TrainState, batch):
        hier = _hier_from_cfg(cfg, batch, level_caps) if use_lidar else None
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, hier, train=False)
        res = {}
        if cfg.MODEL.USE_LIDAR:
            res["pred_3d"] = jnp.argmax(out["lidar_seg_logit"], -1)
            res["seg_loss_3d"] = weighted_cross_entropy(
                out["lidar_seg_logit"], batch["seg_label"], batch["pt_valid"],
                class_weights)
        if cfg.MODEL.USE_IMAGE:
            res["pred_2d"] = jnp.argmax(out["img_seg_logit"], -1)
            res["seg_loss_2d"] = weighted_cross_entropy(
                out["img_seg_logit"], batch["seg_label"], batch["pt_valid"],
                class_weights)
        if cfg.MODEL.USE_FUSION:
            probs = (jax.nn.softmax(out["img_seg_logit"], -1)
                     + jax.nn.softmax(out["lidar_seg_logit"], -1))
            res["pred_ensemble"] = jnp.argmax(probs, -1)
        return res

    return step, caps
