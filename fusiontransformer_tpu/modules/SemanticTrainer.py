"""Epoch trainer (reference ``modules/SemanticTrainer.py:20-318``).

Same lifecycle: build model/metrics -> optimizer/scheduler -> checkpointer
(auto-resume) -> TB writer -> dataloaders -> epoch loop {train epoch, log,
summary, validate, best-metric tracking, checkpoint-on-best}.  The hot path is
one jitted ``train_step`` (see ``modules/steps.py``); the scheduler steps per
epoch by injecting a new LR into the optax state (``SemanticTrainer.py:217``).
"""

from __future__ import annotations

import logging
import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.data.build import build_dataloader
from fusiontransformer_tpu.data.utils.validate import validate
from fusiontransformer_tpu.models.build import build_model
from fusiontransformer_tpu.models.metric import SegIoU
from fusiontransformer_tpu.modules.steps import (TrainState, _device_batch,
                                                 make_eval_step,
                                                 make_train_step)
from fusiontransformer_tpu.solver.build import (build_optimizer,
                                                get_learning_rate,
                                                set_learning_rate)
from fusiontransformer_tpu.utils import wandb_stub as wandb
from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2
from fusiontransformer_tpu.utils.metric_logger import MetricLogger


def init_train_state(cfg, model, tx, batch_size, rng_seed=1):
    """Initialize params/batch_stats from a shape-only dummy batch."""
    from fusiontransformer_tpu.modules.steps import level_caps_from_cfg
    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

    caps = level_caps_from_cfg(cfg, batch_size)
    n = caps[0]
    ds = cfg.DATASET.get(cfg.DATASET.TYPE, {})
    h = ds.get("image_height", 370)
    w = ds.get("image_width", 1226)
    dummy = {
        "coords": jnp.zeros((n, 3), jnp.int32),
        "feats": jnp.zeros((n, 4), jnp.float32),
        "seg_label": jnp.zeros((n,), jnp.int32),
        "pt_batch": jnp.zeros((n,), jnp.int32),
        "pt_valid": jnp.zeros((n,), bool).at[:8].set(True),
        "img": jnp.zeros((batch_size, h, w, 3), jnp.float32),
        "img_indices": jnp.zeros((n, 2), jnp.int32),
    }
    use_lidar = cfg.MODEL.USE_LIDAR

    @jax.jit
    def _init(rng, dummy):
        hier = (build_hierarchy(dummy["coords"], dummy["pt_batch"],
                                dummy["pt_valid"], caps)
                if use_lidar else None)
        return model.init(rng, dummy, hier, train=False)

    variables = _init(jax.random.PRNGKey(rng_seed), dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params) if tx is not None else None
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))


class SemanticTrainer:
    def __init__(self, cfg, output_dir, run_name):
        self.cfg = cfg
        self.output_dir = output_dir
        self.run_name = run_name
        self.logger = logging.getLogger(
            f"FusionTransformer.{cfg['MODEL']['TYPE']}.train")
        # Rank guard: on multi-host runs (DistributedTrainer calls
        # initialize_distributed() before this) only rank 0 opens wandb/TB —
        # otherwise every host forks its own wandb run and interleaves
        # identical scalars into the shared event directory.
        self._is_master = jax.process_index() == 0
        if self._is_master:
            wandb.login()
            self.run = wandb.init(
                project="FusionTransformer", config=dict(cfg),
                group=cfg["MODEL"]["TYPE"], sync_tensorboard=True)
        else:
            self.run = None

        built = build_model(cfg)
        self.model = built[0]
        if cfg.MODEL.USE_FUSION:
            _, self.train_2d_metric, self.train_3d_metric = built
        elif cfg.MODEL.USE_LIDAR:
            self.train_3d_metric = built[1]
        elif cfg.MODEL.USE_IMAGE:
            self.train_2d_metric = built[1]

        self.train_dataloader = build_dataloader(cfg, mode="train")
        self.val_dataloader = (build_dataloader(cfg, mode="val")
                               if cfg.VAL.PERIOD > 0 else None)
        steps_per_epoch = max(1, len(self.train_dataloader))

        self.tx, self.lr_schedule = build_optimizer(cfg, steps_per_epoch)
        self.steps_per_epoch = steps_per_epoch
        accum = int(cfg.TRAIN.GRAD_ACCUM_STEPS)
        if accum > 1 and steps_per_epoch % accum != 0:
            self.logger.warning(
                "steps_per_epoch (%d) is not a multiple of "
                "TRAIN.GRAD_ACCUM_STEPS (%d): accumulation windows straddle "
                "epoch boundaries — the per-epoch LR change lands mid-window "
                "and the final partial window of the run is discarded",
                steps_per_epoch, accum)

        self.state = init_train_state(cfg, self.model, self.tx,
                                      cfg.TRAIN.BATCH_SIZE, cfg.RNG_SEED)
        if cfg.MODEL.IMAGE_PRETRAINED_PATH:
            from fusiontransformer_tpu.models.build import (
                maybe_load_pretrained_image)
            params = jax.tree_util.tree_map(np.asarray, self.state.params)
            n_loaded = maybe_load_pretrained_image(cfg, params)
            self.state = self.state._replace(params=params)
            self.logger.info("Loaded %d pretrained image tensors from %s",
                             n_loaded, cfg.MODEL.IMAGE_PRETRAINED_PATH)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.state.params))
        self.logger.info("#Parameters: %.2e", n_params)

        step_fn, self.level_caps = make_train_step(cfg, self.model, self.tx,
                                                   cfg.TRAIN.BATCH_SIZE)
        self.train_step_fn = jax.jit(step_fn, donate_argnums=(0,))
        eval_fn, _ = make_eval_step(cfg, self.model, cfg.VAL.BATCH_SIZE)
        self.eval_step_fn = jax.jit(eval_fn)
        # TPU.ADAPTIVE_LEVEL_CAPS: per-batch occupancy-compacted capacities;
        # one jitted step per distinct (ladder-quantized) capacity tuple.
        self._adaptive_caps = bool(
            cfg.TPU.ADAPTIVE_LEVEL_CAPS) if "ADAPTIVE_LEVEL_CAPS" in cfg.TPU \
            else False
        self._adaptive_caps = self._adaptive_caps and cfg.MODEL.USE_LIDAR
        # LRU-bounded: each live compiled step holds ~1 GB host-side and
        # the ladders mint new tuples for the whole run (ROADMAP r5 leak).
        from fusiontransformer_tpu.modules.steps import StepCache
        cache_n = (int(cfg.TPU.STEP_CACHE_SIZE)
                   if "STEP_CACHE_SIZE" in cfg.TPU else 16)
        self._adaptive_train_steps = StepCache(cache_n)
        self._adaptive_eval_steps = StepCache(cache_n)

        self.checkpointer = CheckpointerV2(
            save_dir=output_dir, logger=self.logger,
            max_to_keep=cfg.TRAIN.MAX_TO_KEEP,
            async_save=bool(cfg.TRAIN.get("ASYNC_CHECKPOINT", False)))
        self.checkpoint_data = self._load_checkpoint()

        if output_dir and self._is_master:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.summary_writer = SummaryWriter(
                    osp.join(output_dir, f"tb.{run_name}"))
            except Exception:
                self.summary_writer = None
        else:
            self.summary_writer = None

        self.start_epoch = int(self.checkpoint_data.get("epoch", 0))
        self.best_metric_name = f"best_{cfg.VAL.METRIC}"
        modalities = (["2d", "3d"] if cfg.MODEL.USE_FUSION
                      else ["3d"] if cfg.MODEL.USE_LIDAR else ["2d"])
        self.modalities = modalities
        self.best_metric = {
            m: self.checkpoint_data.get(f"{m}_{self.best_metric_name}")
            for m in modalities}
        self.best_metric_epoch = {m: -1 for m in modalities}

        self.train_metric_logger = MetricLogger(delimiter="  ")
        if hasattr(self, "train_3d_metric"):
            self.train_metric_logger.add_meters(self.train_3d_metric)
        if hasattr(self, "train_2d_metric"):
            self.train_metric_logger.add_meters(self.train_2d_metric)
        self.val_metric_logger = MetricLogger(delimiter="  ")
        self._rng = jax.random.PRNGKey(cfg.RNG_SEED)

    # ------------------------------------------------------------------ #
    def _load_checkpoint(self):
        payload = self.checkpointer.load(self.cfg.RESUME_PATH,
                                         resume=self.cfg.AUTO_RESUME,
                                         resume_states=self.cfg.RESUME_STATES)
        if not payload:
            return {}
        params = payload.get("params", self.state.params)
        bs = payload.get("batch_stats", self.state.batch_stats)
        opt_state = self.state.opt_state
        if payload.get("opt_state") is not None:
            from flax import serialization
            saved_k = payload.get("grad_accum_steps")
            cur_k = int(self.cfg.TRAIN.GRAD_ACCUM_STEPS)
            if saved_k is not None and int(saved_k) != cur_k:
                raise ValueError(
                    f"checkpoint was saved with TRAIN.GRAD_ACCUM_STEPS="
                    f"{int(saved_k)} but the run has {cur_k}: the optimizer "
                    "state layout depends on it — set the same value, or "
                    "resume with RESUME_STATES False to drop the optimizer "
                    "state")
            try:
                opt_state = serialization.from_state_dict(
                    self.state.opt_state, payload["opt_state"])
            except Exception as e:
                raise ValueError(
                    "optimizer-state restore failed (tree mismatch). The "
                    "opt_state layout depends on TRAIN.GRAD_ACCUM_STEPS "
                    "(optax.MultiSteps wraps the state when > 1) — make "
                    "sure it matches the checkpoint's value, or resume "
                    f"with RESUME_STATES False. Original error: {e}") from e
        step = jnp.asarray(payload.get("step", 0), jnp.int32)
        self.state = TrainState(params, bs, opt_state, step)
        # Scalar bookkeeping (epoch, best metrics) for resume.
        return {k: v for k, v in payload.items()
                if k not in ("params", "batch_stats", "opt_state", "step")}

    # ------------------------------------------------------------------ #
    def _to_device(self, batch):
        """Array-only device view of a collated batch; the distributed
        trainer overrides this to form mesh-sharded (multi-host) arrays.

        Explicit async device_put: handing numpy arrays to the jitted step
        would block on the H2D copy at call time, serializing the transfer
        with the previous step's compute (measured one full host<->device
        round trip per step on tunneled hosts)."""
        return jax.device_put(_device_batch(batch))

    # ------------------------------------------------------------------ #
    def _train_step_for(self, host_batch):
        """The jitted train step for this batch's capacities.

        TPU.ADAPTIVE_LEVEL_CAPS: voxel capacities follow the batch's exact
        per-level unique-voxel counts (collate's ``level_counts``), ladder-
        quantized — one trace per distinct capacity tuple, logged."""
        if not self._adaptive_caps or "level_counts" not in host_batch:
            return self.train_step_fn
        from fusiontransformer_tpu.modules.steps import adaptive_level_caps
        caps = adaptive_level_caps(self.cfg, len(host_batch["pt_valid"]),
                                   host_batch["level_counts"])
        fn = self._adaptive_train_steps.get(caps)
        if fn is None:
            self.logger.info("ADAPTIVE_LEVEL_CAPS: tracing train step for "
                             "capacities %s", caps)
            step_fn, _ = make_train_step(self.cfg, self.model, self.tx,
                                         self.cfg.TRAIN.BATCH_SIZE,
                                         level_caps=caps)
            fn = jax.jit(step_fn, donate_argnums=(0,))
            self._adaptive_train_steps[caps] = fn
        return fn

    def _eval_step_for(self, host_batch):
        if not self._adaptive_caps or "level_counts" not in host_batch:
            return self.eval_step_fn
        from fusiontransformer_tpu.modules.steps import adaptive_level_caps
        caps = adaptive_level_caps(self.cfg, len(host_batch["pt_valid"]),
                                   host_batch["level_counts"])
        fn = self._adaptive_eval_steps.get(caps)
        if fn is None:
            self.logger.info("ADAPTIVE_LEVEL_CAPS: tracing eval step for "
                             "capacities %s", caps)
            eval_fn, _ = make_eval_step(self.cfg, self.model,
                                        self.cfg.VAL.BATCH_SIZE,
                                        level_caps=caps)
            fn = jax.jit(eval_fn)
            self._adaptive_eval_steps[caps] = fn
        return fn

    def train_for_one_epoch(self, epoch):
        from tqdm import tqdm

        self.train_metric_logger.reset()
        if hasattr(self, "train_3d_metric"):
            self.train_3d_metric.reset()
        if hasattr(self, "train_2d_metric"):
            self.train_2d_metric.reset()
        self.train_dataloader.set_epoch(epoch)
        # Metrics are consumed ONE step late: jax dispatch is async, so
        # deferring the device_get until after the NEXT step is enqueued
        # hides the device->host sync behind that step's compute (a full
        # round trip per step otherwise — the training-loop analog of the
        # serving pipeline in serving/server.py).
        pending = None
        for batch in tqdm(self.train_dataloader,
                          desc=f"training for epoch {epoch}",
                          total=len(self.train_dataloader), leave=False):
            self._rng, step_rng = jax.random.split(self._rng)
            step_fn = self._train_step_for(batch)
            dev_batch = self._to_device(batch)
            self._last_batch, self._last_rng = dev_batch, step_rng
            self.state, metrics = step_fn(self.state, dev_batch, step_rng)
            if pending is not None:
                self._consume_step_metrics(pending)
            pending = metrics
            if getattr(self, "_preempted", False):
                break   # SIGTERM: stop at a step boundary, state is intact
        if pending is not None:
            self._consume_step_metrics(pending)
        if getattr(self, "_preempted", False):
            return
        # Per-epoch scheduler step (SemanticTrainer.py:217).
        new_lr = self.lr_schedule((epoch + 1) * self.steps_per_epoch)
        self.state = self.state._replace(
            opt_state=set_learning_rate(self.state.opt_state, new_lr))

    def _log_host_memory(self, epoch):
        """Per-epoch host-RSS line (always) + full discriminating snapshot
        (FTX_MEMDIAG=1) + optional malloc_trim (FTX_MALLOC_TRIM=1) — the
        ROADMAP "Known issue (r4)" leak watch; any regression shows in every
        future converge log."""
        import os
        from fusiontransformer_tpu.utils import memdiag
        if os.environ.get("FTX_MEMDIAG", "") == "1":
            snap = memdiag.snapshot()
            self.logger.info("memdiag[%d]: %s", epoch,
                             memdiag.format_snapshot(snap))
            tr = memdiag.trace_report()
            if tr:
                self.logger.info("memdiag[%d]: %s", epoch, tr)
            self._last_rss_mb = snap.get("rss_mb", 0.0)
        else:
            self._last_rss_mb = memdiag.rss_mb()
            self.logger.info("host RSS after epoch %d: %.0f MB", epoch,
                             self._last_rss_mb)
        if memdiag.maybe_trim():
            self.logger.info("malloc_trim released pages; RSS now %.0f MB",
                             memdiag.rss_mb())

    def _consume_step_metrics(self, metrics):
        """Device_get + log one step's metrics (deferred by one step)."""
        host = {k: v for k, v in metrics.items() if not k.startswith("cm_")}
        host = jax.device_get(host)
        # Failure detection: a non-finite loss means the run is dead —
        # fail fast with state intact rather than burning epochs
        # (jax.debug_nans is the opt-in fine-grained variant, utils/rng).
        # Deferred consumption fires this one step late; state stays valid.
        if not np.isfinite(float(host.get("total_loss", 0.0))):
            raise FloatingPointError(
                f"non-finite loss at step {int(self.state.step)}: "
                f"{ {k: float(v) for k, v in host.items()} }")
        if int(host.get("voxel_overflow", 0)) > 0:
            self.logger.warning(
                "voxel capacity overflow: %d voxels dropped this step — "
                "raise TPU.LEVEL_CAPACITY_FRACTIONS",
                int(host["voxel_overflow"]))
        if int(host.get("tap_overflow", 0)) > 0:
            self.logger.warning(
                "conv tap-slot overflow: %d live taps dropped this step — "
                "gradients of the binned conv are inconsistent with its "
                "forward under overflow; raise TPU.CONV_TAP_SLOTS",
                int(host["tap_overflow"]))
        self.train_metric_logger.update(
            **{k: float(v) for k, v in host.items()})
        if "cm_3d" in metrics and hasattr(self, "train_3d_metric"):
            self.train_3d_metric.update_matrix(np.asarray(metrics["cm_3d"]))
        if "cm_2d" in metrics and hasattr(self, "train_2d_metric"):
            self.train_2d_metric.update_matrix(np.asarray(metrics["cm_2d"]))
        if self._is_master:
            wandb.log({k: float(v) for k, v in host.items()
                       if k.startswith(("seg_loss", "xm_loss"))})

    def update_log(self, epoch):
        lp = self.cfg.TRAIN.LOG_PERIOD
        if epoch == 1 or (lp > 0 and epoch % lp == 0):
            self.logger.info(
                "iter: %4d  %s  lr: %.2e", epoch,
                str(self.train_metric_logger),
                get_learning_rate(self.state.opt_state))
        self._write_jsonl(epoch)

    def _write_jsonl(self, epoch):
        """Per-epoch JSONL metrics stream (torchpack JSONLWriter parity,
        reference TorchpackInterface.py:135-140)."""
        if not self.output_dir:
            return
        import json
        rec = {"epoch": epoch,
               "lr": get_learning_rate(self.state.opt_state),
               "host_rss_mb": getattr(self, "_last_rss_mb", 0.0)}
        for name, meter in self.train_metric_logger.meters.items():
            try:
                rec["train/" + name] = float(meter.global_avg)
            except Exception:
                pass
        for name, meter in self.val_metric_logger.meters.items():
            try:
                rec["val/" + name] = float(meter.global_avg)
            except Exception:
                pass
        with open(osp.join(self.output_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def update_summary(self, epoch):
        sw = self.summary_writer
        if sw is not None and self.cfg.TRAIN.SUMMARY_PERIOD > 0 \
                and epoch % self.cfg.TRAIN.SUMMARY_PERIOD == 0:
            keywords = ("loss", "acc", "iou")
            for name, meter in self.train_metric_logger.meters.items():
                if any(k in name for k in keywords):
                    sw.add_scalar("train/" + name, meter.avg,
                                  global_step=epoch)
            if self.cfg.TRAIN.LOG_HISTOGRAM:
                # Weight histograms (reference TorchpackCallbacks.py:289-301).
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                        self.state.params)[0]:
                    name = "/".join(str(getattr(p, "key", p)) for p in path)
                    sw.add_histogram("params/" + name,
                                     np.asarray(leaf).ravel(),
                                     global_step=epoch)
                # Grad histograms via a lazily-compiled grads-only pass on
                # the epoch's last batch (reference logs p.grad per epoch).
                if getattr(self, "_last_batch", None) is not None:
                    if not hasattr(self, "_grads_fn"):
                        from fusiontransformer_tpu.modules.steps import \
                            make_grads_fn
                        self._grads_fn = jax.jit(make_grads_fn(
                            self.cfg, self.model,
                            self.cfg.TRAIN.BATCH_SIZE))
                    # gslot maps are sized to the batch's adaptive caps;
                    # the grads fn rebuilds the hierarchy at shape-derived
                    # caps, so it uses the device slot path instead.
                    gb = {k: v for k, v in self._last_batch.items()
                          if not k.startswith(("gslot_src_", "gslot_bin_"))}
                    grads = self._grads_fn(self.state, gb, self._last_rng)
                    for path, leaf in jax.tree_util.tree_flatten_with_path(
                            grads)[0]:
                        name = "/".join(
                            str(getattr(p, "key", p)) for p in path)
                        sw.add_histogram("grads/" + name,
                                         np.asarray(leaf).ravel(),
                                         global_step=epoch)

    def validate_for_one_epoch(self, epoch):
        """Returns True iff validation actually ran this epoch."""
        if self.val_dataloader is None:
            return False
        if self.cfg.VAL.PERIOD > 0 and (
                epoch % self.cfg.VAL.PERIOD == 0
                or epoch == self.cfg.SCHEDULER.MAX_EPOCH - 1):
            self.val_metric_logger.reset()
            eval_step = self.eval_step_fn
            if self._adaptive_caps:
                def eval_step(state, dev_batch, host_batch):  # noqa: F811
                    return self._eval_step_for(host_batch)(state, dev_batch)
                eval_step.wants_host_batch = True
            validate(self.cfg, eval_step, self.state,
                     self.val_dataloader, self.val_metric_logger,
                     cm_allreduce=self._val_cm_allreduce(),
                     log_tables=self._is_master)
            return True
        return False

    def _val_cm_allreduce(self):
        """Cross-process confusion-matrix sum for sharded eval; the plain
        trainer is single-process (None = no reduction)."""
        return None

    def update_validation_logging_meters(self, epoch):
        if not self.val_metric_logger.meters:
            return
        self.logger.info("Epoch[%d]-Val %s", epoch,
                         self.val_metric_logger.summary_str)
        for modality in self.modalities:
            name = f"{self.cfg.VAL.METRIC}_{modality}"
            if name in self.val_metric_logger.meters:
                cur = self.val_metric_logger.meters[name].global_avg
                if self.best_metric[modality] is None \
                        or self.best_metric[modality] < cur:
                    self.best_metric[modality] = cur
                    self.best_metric_epoch[modality] = epoch
        for modality in self.modalities:
            if self.best_metric[modality] is not None:
                self.logger.info(
                    "Best val-%s-%s = %.2f at epoch %d", modality.upper(),
                    self.cfg.VAL.METRIC, self.best_metric[modality] * 100,
                    self.best_metric_epoch[modality])

    def update_checkpoint(self, epoch):
        cp = self.cfg.TRAIN.CHECKPOINT_PERIOD
        if (cp > 0 and epoch % cp == 0) \
                or epoch == self.cfg.SCHEDULER.MAX_EPOCH \
                or any(self.best_metric_epoch.get(m) == epoch
                       for m in self.modalities):
            # 'epoch' stores the NEXT epoch to run, so resume continues after
            # the checkpointed one (the reference stores the raw index but its
            # plain trainer never actually resumes the loop; we do).
            extra = {"epoch": epoch + 1, "step": np.asarray(self.state.step),
                 "grad_accum_steps": int(self.cfg.TRAIN.GRAD_ACCUM_STEPS)}
            for m in self.modalities:
                if self.best_metric[m] is not None:
                    extra[f"{m}_{self.best_metric_name}"] = float(
                        self.best_metric[m])
            self.checkpointer.save(
                f"model{epoch:06d}",
                tree={"params": self.state.params,
                      "batch_stats": self.state.batch_stats,
                      "opt_state": self.state.opt_state},
                **extra)

    # ------------------------------------------------------------------ #
    def _install_preemption_handler(self):
        """SIGTERM-safe training (no reference equivalent — preemptible TPU
        slices get a termination notice as SIGTERM): set a flag, let the
        current step finish, checkpoint with the CURRENT epoch index (resume
        re-runs the interrupted epoch), then exit cleanly."""
        import signal
        import threading

        self._preempted = False
        if threading.current_thread() is not threading.main_thread():
            return

        def on_sigterm(signum, frame):
            self._preempted = True
            self.logger.warning(
                "SIGTERM received — will checkpoint and stop after the "
                "current step")

        try:
            self._prev_sigterm = signal.signal(signal.SIGTERM, on_sigterm)
        except ValueError:  # pragma: no cover - non-main interpreter
            pass

    def _save_preemption_checkpoint(self, epoch):
        """Checkpoint that resumes INTO the interrupted epoch (plain
        checkpoints store epoch+1 — see update_checkpoint)."""
        extra = {"epoch": epoch, "step": np.asarray(self.state.step),
                 "grad_accum_steps": int(self.cfg.TRAIN.GRAD_ACCUM_STEPS)}
        for m in self.modalities:
            if self.best_metric[m] is not None:
                extra[f"{m}_{self.best_metric_name}"] = float(
                    self.best_metric[m])
        self.checkpointer.save(
            f"preempt{epoch:06d}",
            tree={"params": self.state.params,
                  "batch_stats": self.state.batch_stats,
                  "opt_state": self.state.opt_state},
            **extra)
        self.checkpointer.wait()
        self.logger.warning("Preemption checkpoint written for epoch %d",
                            epoch)

    def train(self):
        max_epoch = int(self.cfg.SCHEDULER.MAX_EPOCH)
        self._install_preemption_handler()
        for epoch in range(self.start_epoch, max_epoch):
            t0 = time.time()
            self.train_for_one_epoch(epoch)
            if self._preempted:
                self._save_preemption_checkpoint(epoch)
                break
            self.logger.info("Epoch %d took %.1fs", epoch, time.time() - t0)
            self._log_host_memory(epoch)
            self.update_log(epoch)
            self.update_summary(epoch)
            # Only epochs that actually validated log Val meters / update
            # best-metric tracking (VAL.PERIOD > 1 otherwise re-logged the
            # previous validation's meters under the current epoch number).
            if self.validate_for_one_epoch(epoch):
                self.update_validation_logging_meters(epoch)
            if any(self.best_metric_epoch.get(m) == epoch
                   for m in self.modalities):
                self.update_checkpoint(epoch)
        self.checkpointer.wait()     # join any in-flight async save
        if self._is_master:
            wandb.finish()
        return self.state
