"""Checkpointer with last-checkpoint manifest + max-to-keep GC.

Reference semantics (``common/utils/checkpoint.py:12-161``): saves named
checkpoints, tracks the newest in a ``last_checkpoint`` manifest file,
garbage-collects beyond ``max_to_keep``, and supports resume with or without
optimizer/scheduler states.

Storage: Orbax PyTreeCheckpointer (directory per checkpoint) with a msgpack
fallback if orbax is unavailable.  The checkpoint payload is a pure pytree
{params, batch_stats, opt_state, epoch, ...} — no pickled Python objects.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import shutil
import threading

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from flax import serialization


class CheckpointerV2:
    _LAST = "last_checkpoint"

    def __init__(self, save_dir="", logger=None, max_to_keep=100, postfix="",
                 async_save=False):
        # orbax requires absolute paths; keep relative OUTPUT_DIRs working.
        self.save_dir = osp.abspath(save_dir) if save_dir else save_dir
        self.logger = logger or logging.getLogger(__name__)
        self.max_to_keep = max_to_keep
        self.postfix = postfix
        self.async_save = async_save
        self._pending = None             # background writer thread
        self._write_error = None         # failure from the last async write
        self._saved = self._load_manifest_list()
        self._gc_orphaned_tmp()

    def _gc_orphaned_tmp(self):
        """Remove half-written ``*.orbax-checkpoint-tmp*`` dirs left behind by
        an interrupted async save (they are never valid restore targets and
        orbax's own GC only runs under a CheckpointManager)."""
        if not self.save_dir or not osp.isdir(self.save_dir):
            return
        for entry in os.listdir(self.save_dir):
            if ".orbax-checkpoint-tmp" in entry:
                victim = osp.join(self.save_dir, entry)
                self.logger.info(
                    "Removing orphaned interrupted checkpoint %s", victim)
                shutil.rmtree(victim, ignore_errors=True)

    # -- manifest -----------------------------------------------------------
    def _manifest_path(self):
        return osp.join(self.save_dir, self._LAST + self.postfix)

    def _load_manifest_list(self):
        path = self._manifest_path()
        if self.save_dir and osp.exists(path):
            with open(path) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
            return lines
        return []

    def has_checkpoint(self):
        self.wait()
        return bool(self._saved)

    def get_checkpoint_file(self):
        self.wait()
        return self._saved[-1] if self._saved else ""

    # -- save/load ----------------------------------------------------------
    def wait(self):
        """Join any in-flight async save (no-op when none is pending).

        Re-raises a failed background write here: callers that wait() before
        relying on the checkpoint (preemption save, end-of-training) must not
        believe a save succeeded when the write thread died (e.g. disk full).
        """
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._write_error is not None:
            err, self._write_error = self._write_error, None
            raise RuntimeError(
                f"async checkpoint write failed: {err}") from err

    def save(self, name, tree=None, **extra):
        """Save a checkpoint.

        With ``async_save``, the device->host snapshot still happens HERE
        (the trainer's donated buffers are reused by the next step, so the
        arrays must be read before returning); only the multi-minute disk
        write moves to a background thread.  Saves serialize: a new save
        joins the previous one first; ``wait()``/``load()`` join too, so
        readers never observe a half-written newest checkpoint.
        """
        if not self.save_dir:
            return
        payload = dict(tree or {})
        payload.update(extra)
        path = osp.join(self.save_dir, name + ".ckpt")
        # Canonicalize to a pure nested dict (NamedTuples -> field dicts) so
        # restore is structure-independent; callers rebuild typed pytrees with
        # flax.serialization.from_state_dict.
        payload = serialization.to_state_dict(payload)
        payload = jax.tree_util.tree_map(np.asarray, payload)
        self.wait()
        if self.async_save:
            self._pending = threading.Thread(
                target=self._write, args=(path, payload), daemon=True)
            self._pending.start()
        else:
            self._write(path, payload)
            self.wait()   # no-op join; re-raises a sync write failure

    def _write(self, path, payload):
        try:
            if _HAS_ORBAX:
                ckptr = ocp.PyTreeCheckpointer()
                if osp.exists(path):
                    shutil.rmtree(path)
                ckptr.save(path, payload)
            else:  # pragma: no cover
                with open(path, "wb") as f:
                    f.write(serialization.to_bytes(payload))
            self._saved.append(path)
            self._gc()
            with open(self._manifest_path(), "w") as f:
                f.write("\n".join(self._saved))
            self.logger.info("Saved checkpoint to %s", path)
            # W&B artifact upload (reference checkpoint.py:62); no-op
            # without wandb.
            try:
                from fusiontransformer_tpu.utils import wandb_stub as wandb
                wandb.save(path)
            except Exception:
                pass
        except Exception as e:  # pragma: no cover - re-raised at wait()
            self.logger.exception("Checkpoint write failed: %s", path)
            self._write_error = e

    def _gc(self):
        while len(self._saved) > self.max_to_keep:
            victim = self._saved.pop(0)
            if osp.isdir(victim):
                shutil.rmtree(victim, ignore_errors=True)
            elif osp.exists(victim):
                os.remove(victim)

    def load(self, path=None, resume=True, resume_states=True, target=None):
        """Returns the restored payload dict ({} when nothing to restore).

        ``resume_states=False`` strips optimizer/scheduler state, mirroring
        the reference's RESUME_STATES flag.
        """
        self.wait()
        if not path and resume and self.has_checkpoint():
            path = self.get_checkpoint_file()
        if not path:
            self.logger.info("No checkpoint found; training from scratch.")
            return {}
        path = osp.abspath(path)
        self.logger.info("Loading checkpoint from %s, MD5: %s", path,
                         checkpoint_md5(path))
        if _HAS_ORBAX and osp.isdir(path):
            payload = ocp.PyTreeCheckpointer().restore(path)
        else:  # pragma: no cover
            with open(path, "rb") as f:
                payload = serialization.msgpack_restore(f.read())
        if not resume_states:
            payload = {k: v for k, v in payload.items()
                       if k not in ("opt_state", "epoch")}
        return payload


def checkpoint_md5(path):
    """MD5 of a checkpoint for the load log line (reference
    ``common/utils/checkpoint.py:73``).  Orbax checkpoints are directories,
    so hash every file's content in sorted relative-path order."""
    from fusiontransformer_tpu.utils.io import get_md5

    if osp.isfile(path):
        return get_md5(path)
    import hashlib

    h = hashlib.md5()
    for root, _, files in sorted(os.walk(path)):
        for fn in sorted(files):
            fp = osp.join(root, fn)
            h.update(osp.relpath(fp, path).encode())
            h.update(get_md5(fp).encode())
    return h.hexdigest()


# Backwards-parity alias (the reference also exposes plain Checkpointer).
Checkpointer = CheckpointerV2
