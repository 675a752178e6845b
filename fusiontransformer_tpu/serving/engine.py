"""TPU-native inference engine: long-lived compiled programs for deployment.

The reference has no serving story — its only inference path is
``test.py`` driving ``validate()`` over on-disk pickles
(reference ``data/utils/validate.py:13-150``).  Deployed TPU inference wants
the opposite shape: a resident process that owns the model variables and ONE
compiled XLA program per static input shape, does the dataloader's eval-time
preprocessing host-side per request, and devoxelizes predictions back to the
caller's raw scan.  This module is that runtime:

* ``make_predict_step`` — label-only jitted step (no losses / no labels
  needed, unlike ``modules/steps.make_eval_step``): hierarchy build →
  forward → per-point argmax (softmax-sum ensemble for fusion models,
  parity with reference ``validate.py:67-70``).
* ``InferenceEngine`` — request-level API.  ``predict(record)`` takes a raw
  scan record in the preprocessed-pickle schema (``points`` [N,3] lidar
  meters, ``feats`` [N,≤4], ``img`` HWC, ``points_img`` [N,2] row/col —
  reference ``data/semantic_kitti/preprocess.py:154-167``) and returns
  per-point train-id labels for EVERY input point (out-of-frustum /
  capacity-dropped points get class 0, the ignore id — same honest-error
  convention as ``data/utils/validate.py:21-36``).
* ``warmup()`` — compiles every capacity bucket before traffic; a cold XLA
  compile is seconds-to-minutes and must never land on a request.

Shape policy mirrors training: per-scan capacity buckets
(``TPU.CAPACITY_BUCKETS``) bound the program count while letting small scans
skip worst-case padding — gathers are row-count-bound on TPU, so bucket
routing is the serving latency lever (measured 1.69x for 10k-point scans).
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.data.collate import collate_padded
from fusiontransformer_tpu.data.quantize import sparse_quantize
from fusiontransformer_tpu.data.utils.augmentation_3d import (
    augment_and_scale_3d)
from fusiontransformer_tpu.data.utils.validate import map_sparse_to_org
from fusiontransformer_tpu.models.build import build_model
from fusiontransformer_tpu.modules.steps import (TrainState, _device_batch,
                                                 _hier_from_cfg)


def make_predict_step(cfg, model):
    """Labels-only inference step (one jitted program per batch shape).

    Returns ``(step, keys)``: the step emits ONE packed ``[N, K]`` int32
    array whose columns are ``keys`` — every per-point prediction plus the
    broadcast ``voxel_overflow`` health metric.  One output array means
    ONE device→host readback per batch; on tunneled dev hosts each
    readback is a full round trip (~50 ms), and even on directly-attached
    hosts fewer transfers is strictly better.
    """
    from fusiontransformer_tpu.modules.steps import (_set_conv_backend,
                                                     norm_tap_slots,
                                                     tap_overflow)
    _set_conv_backend(cfg)   # K-slot convs ride the fused Pallas kernel

    use_lidar = cfg.MODEL.USE_LIDAR
    use_image = cfg.MODEL.USE_IMAGE
    use_fusion = cfg.MODEL.USE_FUSION

    keys = ["pred"]
    if use_image:
        keys.append("pred_2d")
    if use_lidar:
        keys.append("pred_3d")
        keys.append("voxel_overflow")

    def step(state: TrainState, batch):
        hier = _hier_from_cfg(cfg, batch) if use_lidar else None
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, hier, train=False)
        res = {}
        if use_lidar:
            res["pred_3d"] = jnp.argmax(out["lidar_seg_logit"], -1)
        if use_image:
            res["pred_2d"] = jnp.argmax(out["img_seg_logit"], -1)
        if use_fusion:
            probs = (jax.nn.softmax(out["img_seg_logit"], -1)
                     + jax.nn.softmax(out["lidar_seg_logit"], -1))
            res["pred"] = jnp.argmax(probs, -1)
        elif use_lidar:
            res["pred"] = res["pred_3d"]
        else:
            res["pred"] = res["pred_2d"]
        if hier is not None:
            # Lossless-capacity health metric (0 = no voxel dropped),
            # broadcast to a column so the packed result stays one array.
            # Live ks3 taps dropped by the K-slot conv maps count too —
            # the serving path runs the same fused fast path as training.
            overflow = sum(jnp.maximum(l.nvalid_raw - l.valid.shape[0], 0)
                           for l in hier.levels)
            ts = norm_tap_slots(cfg, len(hier.levels))
            if any(ts) and "gslot_src_0" not in batch:
                # Host-built grouped maps (gslot_*) are exactly compacted
                # by the loader; the per-voxel K accounting doesn't apply.
                overflow = overflow + tap_overflow(hier, ts)
            res["voxel_overflow"] = jnp.full(res["pred"].shape, overflow,
                                             jnp.int32)
        return jnp.stack([res[k].astype(jnp.int32) for k in keys], axis=1)

    return step, keys


def shard_predict_step(step_fn, mesh, scans_per_device: int,
                       keys: Sequence[str]):
    """Data-parallel predict over a mesh: whole scans per device, per-point
    predictions stay sharded (device-local gathers only), the overflow
    health metric is psum'd.  Same contiguous-scan layout as training DP
    (``parallel/data_parallel.py``)."""
    from jax.sharding import PartitionSpec as P

    from fusiontransformer_tpu.parallel.data_parallel import _localize_scan_ids

    over_col = keys.index("voxel_overflow") if "voxel_overflow" in keys \
        else None

    def per_device(state, batch):
        batch = _localize_scan_ids(batch, scans_per_device)
        packed = step_fn(state, batch)
        if over_col is not None:
            total = jax.lax.psum(packed[0, over_col], "data")
            packed = packed.at[:, over_col].set(total)
        return packed

    return jax.jit(jax.shard_map(per_device, mesh=mesh,
                                 in_specs=(P(), P("data")),
                                 out_specs=P("data"),
                                 check_vma=False))


class InferenceEngine:
    """Owns model variables + per-bucket compiled predict programs.

    Thread-safe for concurrent ``predict`` calls (device dispatch is
    serialized on a lock — a single TPU core runs one program at a time
    anyway; host preprocessing runs outside the lock and overlaps).

    ``num_devices > 1`` shards the batch over a ``data`` mesh (whole scans
    per device): batch_size must be a multiple, and throughput scales with
    the mesh because every device runs its scans' gathers locally.
    """

    def __init__(self, cfg, params=None, batch_stats=None,
                 checkpoint_path: str = "", batch_size: int = 1,
                 map_inverse_label=None, exported_dir: str = "",
                 num_devices: int = 1):
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.model = None if exported_dir else build_model(cfg)[0]
        self.map_inverse_label = map_inverse_label

        if params is None:
            if not checkpoint_path:
                raise ValueError("need params or checkpoint_path")
            from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2
            payload = CheckpointerV2(save_dir="").load(checkpoint_path,
                                                       resume=False)
            if not payload or "params" not in payload:
                raise ValueError(f"no params in checkpoint {checkpoint_path}")
            params = payload["params"]
            batch_stats = payload.get("batch_stats", {})
        self.state = TrainState(params, batch_stats or {}, None,
                                jnp.zeros((), jnp.int32))

        ds = cfg.DATASET.get(cfg.DATASET.TYPE, {})
        self.scale = ds.get("scale", 20)
        self.full_scale = ds.get("full_scale", 4096)
        self.image_height = ds.get("image_height", 370)
        self.image_width = ds.get("image_width", 1226)
        self.image_normalizer = ds.get("image_normalizer", None)
        self.buckets = tuple(sorted(cfg.TPU.CAPACITY_BUCKETS)) or (
            cfg.TPU.POINT_CAPACITY,)
        self.point_capacity = max(self.buckets)

        assert not (exported_dir and num_devices > 1), (
            "exported artifacts are single-device; shard with num_devices "
            "on a live model")
        if exported_dir:
            # AOT deployment artifact (serving/export.py): per-bucket
            # deserialized StableHLO programs, no Python tracing at serve
            # time.  Shapes come from the artifact's manifest.
            from fusiontransformer_tpu.serving.export import ExportedPredict
            exported = ExportedPredict(exported_dir)
            assert exported.batch_size == self.batch_size, (
                f"artifact exported at batch {exported.batch_size}, "
                f"engine configured for {self.batch_size}")
            self.buckets = tuple(sorted(exported.manifest["buckets"]))
            self.point_capacity = max(self.buckets)
            self.image_height = int(exported.manifest["image_height"])
            self.image_width = int(exported.manifest["image_width"])
            self._pred_keys = list(exported.manifest["pred_keys"])
            self._fn = exported
        elif num_devices > 1:
            assert self.batch_size % num_devices == 0, (
                f"batch_size {self.batch_size} not divisible by "
                f"num_devices {num_devices}")
            from fusiontransformer_tpu.parallel.data_parallel import (
                make_mesh, replicate)
            mesh = make_mesh(num_devices)
            self.state = replicate(self.state, mesh)
            step, self._pred_keys = make_predict_step(cfg, self.model)
            self._fn = shard_predict_step(step, mesh,
                                          self.batch_size // num_devices,
                                          self._pred_keys)
        else:
            step, self._pred_keys = make_predict_step(cfg, self.model)
            self._fn = jax.jit(step)
        # Host-built group-pooled slot maps (ops/host_slots.py): live
        # single-device serving runs the same r5 fast path as training.
        # Gated off for AOT artifacts (their input signature is fixed by
        # the manifest) and sharded serving (per-shard assembly is future
        # work).  The per-batch pool size S is quantum-laddered, so new S
        # rungs retrace exactly like capacity buckets do.
        self._slot_pool = None
        if (not exported_dir and num_devices == 1 and cfg.MODEL.USE_LIDAR
                and "CONV_SLOT_POOL" in cfg.TPU and cfg.TPU.CONV_SLOT_POOL
                and any(cfg.TPU.CONV_TAP_SLOTS)):
            from fusiontransformer_tpu.ops.host_slots import SlotPoolSpec
            self._slot_pool = SlotPoolSpec(
                [l for l, k in enumerate(cfg.TPU.CONV_TAP_SLOTS) if k],
                cfg.TPU.L0_CAPACITY_FRACTION,
                cfg.TPU.LEVEL_CAPACITY_FRACTIONS, adaptive=False,
                quantum=(int(cfg.TPU.SLOT_POOL_QUANTUM)
                         if "SLOT_POOL_QUANTUM" in cfg.TPU else 16))
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.counters = {
            "scans": 0, "batches": 0, "collate_dropped_points": 0,
            "oob_points": 0, "voxel_overflow": 0,
            "bucket_hits": {int(b): 0 for b in self.buckets},
        }

    # ------------------------------------------------------------------ #
    # Host-side preprocessing (eval semantics of the dataloaders:
    # reference semantic_kitti_dataloader.py:150-253 minus augmentation).
    # ------------------------------------------------------------------ #
    def preprocess(self, record: Dict) -> Dict:
        points = np.asarray(record["points"], np.float32)
        n = len(points)
        feats = record.get("feats")
        if feats is None:
            feats = points
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 1:
            feats = feats[:, None]

        img = np.asarray(record["img"])
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img[:self.image_height, :self.image_width].astype(np.float32)
        if self.image_normalizer:
            mean, std = self.image_normalizer
            img = (img - np.asarray(mean, np.float32)) / np.asarray(
                std, np.float32)
        points_img = np.asarray(record["points_img"]).astype(np.int64)
        np.clip(points_img[:, 0], 0, self.image_height - 1,
                out=points_img[:, 0])
        np.clip(points_img[:, 1], 0, self.image_width - 1,
                out=points_img[:, 1])

        coords = augment_and_scale_3d(points, self.scale,
                                      self.full_scale).astype(np.int64)
        keep = (coords.min(1) >= 0) & (coords.max(1) < self.full_scale)
        vox_coords = coords[keep]
        uniq, inverse = sparse_quantize(vox_coords)
        return {
            "coords": vox_coords[uniq].astype(np.int32),
            "feats": feats[keep][uniq].astype(np.float32),
            "seg_label": np.zeros(len(uniq), np.int32),
            "img_indices": points_img[keep][uniq].astype(np.int32),
            "img": img,
            "orig_seg_label": np.zeros(n, np.int32),
            "sparse_orig_points_idx": keep,
            "inverse_map": inverse,
            "num_input_points": n,
        }

    # ------------------------------------------------------------------ #
    def predict(self, record: Dict) -> Dict:
        return self.predict_batch([record])[0]

    def predict_batch(self, records: Sequence[Dict]) -> List[Dict]:
        return self.run_samples([self.preprocess(r) for r in records])

    def run_samples(self, samples: List[Dict],
                    count_stats: bool = True) -> List[Dict]:
        """Device step over already-preprocessed samples (server fast path)."""
        return self.complete(self.dispatch_samples(samples),
                             count_stats=count_stats)

    def dispatch_samples(self, samples: List[Dict]):
        """Async half: collate + enqueue the device step, return a handle.

        JAX dispatch is asynchronous — the arrays in the handle are futures.
        Callers that keep a handle in flight while preparing the next batch
        pipeline H2D + device compute against host work (the server does a
        1-deep pipeline; per-call blocking costs a full host<->device round
        trip that this hides).
        """
        assert 0 < len(samples) <= self.batch_size, len(samples)
        batch = collate_padded(
            samples, self.batch_size, self.point_capacity,
            self.image_height, self.image_width, output_orig=True,
            capacity_buckets=self.buckets, slot_pool=self._slot_pool)
        with self._device_lock:
            # Explicit async device_put: jit called on numpy arguments
            # blocks on the H2D copy, which would serialize transfers with
            # the previous batch's compute and defeat the pipeline.
            db = jax.device_put(_device_batch(batch))
            res = self._fn(self.state, db)
        return (samples, batch, res)

    def complete(self, handle, count_stats: bool = True) -> List[Dict]:
        """Blocking half: ONE packed readback, then devoxelize per scan."""
        samples, batch, packed = handle
        cap = len(batch["pt_valid"]) // self.batch_size
        packed = np.asarray(packed)            # single D2H sync
        res = {k: packed[:, j] for j, k in enumerate(self._pred_keys)}
        overflow = int(res.pop("voxel_overflow", np.zeros(1))[0])

        results = []
        oob_total = 0
        for i, s in enumerate(samples):
            n_vox = int(batch["scan_count"][i])
            sl = slice(i * cap, i * cap + n_vox)
            inverse_map = batch["inverse_map"][i]
            kept = batch["sparse_orig_points_idx"][i]
            out = {"in_frustum": kept,
                   "num_voxels": n_vox}
            for key in ("pred", "pred_2d", "pred_3d"):
                if key not in res:
                    continue
                vox_pred = res[key][sl]
                pt_pred, n_oob = map_sparse_to_org(vox_pred, inverse_map)
                if key == "pred":
                    oob_total += n_oob
                if self.map_inverse_label is not None:
                    pt_pred = self.map_inverse_label(pt_pred)
                full = np.zeros(s["num_input_points"], pt_pred.dtype)
                full[kept] = pt_pred
                out["labels" if key == "pred" else
                    key.replace("pred", "labels")] = full
            results.append(out)

        if count_stats:
            with self._stats_lock:
                c = self.counters
                c["scans"] += len(samples)
                c["batches"] += 1
                c["collate_dropped_points"] += int(batch["num_dropped"])
                c["oob_points"] += oob_total
                c["voxel_overflow"] += overflow \
                    + int(batch.get("gslot_overflow", 0))
                c["bucket_hits"][cap] = c["bucket_hits"].get(cap, 0) + 1
        return results

    # ------------------------------------------------------------------ #
    def warmup(self, buckets: Optional[Sequence[int]] = None) -> Dict[int, float]:
        """Compile every (bucket × batch-fill) program before traffic.

        Returns {bucket: seconds} for the first (compiling) run of each
        bucket at a full batch; partially-filled batches reuse the same
        program (the batch buffer shape is what's traced, not the fill).
        """
        times = {}
        for b in (buckets or self.buckets):
            t0 = time.time()
            samples = [self._dummy_sample(int(b))
                       for _ in range(self.batch_size)]
            # count_stats=False: warmup traffic shouldn't pollute stats, and
            # a snapshot/restore of the counters would discard any REAL
            # requests completing concurrently with the warmup.
            self.run_samples(samples, count_stats=False)
            times[int(b)] = time.time() - t0
        return times

    def _dummy_sample(self, n_points: int) -> Dict:
        """Synthetic record preprocessed to exactly fill ``n_points``."""
        rng = np.random.RandomState(0)
        side = int(np.ceil(n_points ** (1 / 3))) + 1
        grid = np.stack(np.meshgrid(*[np.arange(side)] * 3,
                                    indexing="ij"), -1).reshape(-1, 3)
        return {
            "coords": grid[:n_points].astype(np.int32),
            "feats": rng.rand(n_points, 4).astype(np.float32),
            "seg_label": np.zeros(n_points, np.int32),
            "img_indices": np.zeros((n_points, 2), np.int32),
            "img": np.zeros((self.image_height, self.image_width, 3),
                            np.float32),
            "orig_seg_label": np.zeros(n_points, np.int32),
            "sparse_orig_points_idx": np.ones(n_points, bool),
            "inverse_map": np.arange(n_points),
            "num_input_points": n_points,
        }

    def stats(self) -> Dict:
        with self._stats_lock:
            c = dict(self.counters)
            c["bucket_hits"] = dict(self.counters["bucket_hits"])
        return c
