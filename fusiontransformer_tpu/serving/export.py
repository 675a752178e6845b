"""Ahead-of-time export of the serving predict programs (jax.export).

Deployment wants the compile step OUT of the serving host: trace + lower
once at release time, ship a StableHLO artifact per capacity bucket, and
have the server deserialize instead of tracing Python.  Weights are NOT
baked into the artifact — the exported programs take the variables as call
arguments, so one artifact serves every checkpoint of the same config
(weights ship via the normal checkpoint files).

Layout of an export directory:

    manifest.json                  — shapes, buckets, model/type metadata
    predict_<bucket>.jaxexport     — serialized jax.export artifact

``InferenceEngine(..., exported_dir=...)`` dispatches per-bucket to the
deserialized programs; everything else (preprocessing, devoxelize, stats)
is unchanged.  The artifact records its lowering platform(s) — export on
the platform you serve on (TPU for production, CPU for tests).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fusiontransformer_tpu.modules.steps import TrainState

MANIFEST = "manifest.json"

# The artifact's input pytree contains TrainState; namedtuples must be
# registered by stable name for flatbuffer serialization.
try:
    jax.export.register_namedtuple_serialization(
        TrainState, serialized_name="fusiontransformer_tpu.TrainState")
except ValueError:
    pass   # already registered (repeat imports under pytest)


def _batch_shapes(cap: int, batch_size: int, h: int, w: int):
    n = cap * batch_size
    sds = jax.ShapeDtypeStruct
    return {
        "coords": sds((n, 3), jnp.int32),
        "feats": sds((n, 4), jnp.float32),
        "seg_label": sds((n,), jnp.int32),
        "pt_batch": sds((n,), jnp.int32),
        "pt_valid": sds((n,), jnp.bool_),
        "img": sds((batch_size, h, w, 3), jnp.float32),
        "img_indices": sds((n, 2), jnp.int32),
    }


def _state_shapes(state: TrainState):
    as_sds = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
    return TrainState(
        jax.tree_util.tree_map(as_sds, state.params),
        jax.tree_util.tree_map(as_sds, state.batch_stats),
        None, as_sds(state.step))


def export_predict(cfg, params, batch_stats, out_dir: str,
                   batch_size: int = 1) -> Dict:
    """Export one predict program per capacity bucket; returns the manifest."""
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.serving.engine import make_predict_step

    os.makedirs(out_dir, exist_ok=True)
    model = build_model(cfg)[0]
    step, pred_keys = make_predict_step(cfg, model)
    state = TrainState(params, batch_stats or {}, None,
                       jnp.zeros((), jnp.int32))
    state_sds = _state_shapes(state)

    ds = cfg.DATASET.get(cfg.DATASET.TYPE, {})
    h, w = ds.get("image_height", 370), ds.get("image_width", 1226)
    buckets = tuple(sorted(cfg.TPU.CAPACITY_BUCKETS)) or (
        cfg.TPU.POINT_CAPACITY,)

    manifest = {
        "model_type": cfg.MODEL.TYPE,
        "num_classes": int(cfg.MODEL.NUM_CLASSES),
        "batch_size": int(batch_size),
        "buckets": [int(b) for b in buckets],
        "image_height": int(h), "image_width": int(w),
        "platforms": [jax.default_backend()],
        "jax_version": jax.__version__,
        "pred_keys": list(pred_keys),   # columns of the packed [N, K] output
        "artifacts": {},
    }
    for cap in buckets:
        exp = jax.export.export(jax.jit(step))(
            state_sds, _batch_shapes(int(cap), batch_size, h, w))
        fname = f"predict_{int(cap)}.jaxexport"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        manifest["artifacts"][str(int(cap))] = fname
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedPredict:
    """Per-bucket deserialized predict programs with the live-step call
    signature ``fn(state, device_batch) -> res`` (drop-in for the jitted
    step inside :class:`InferenceEngine`)."""

    def __init__(self, export_dir: str):
        with open(os.path.join(export_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.batch_size = int(self.manifest["batch_size"])
        self._fns = {}
        for cap_s, fname in self.manifest["artifacts"].items():
            with open(os.path.join(export_dir, fname), "rb") as f:
                exported = jax.export.deserialize(f.read())
            # jit the .call so repeat invocations hit the executable cache
            # instead of re-embedding the StableHLO each time.
            self._fns[int(cap_s)] = jax.jit(exported.call)

    def __call__(self, state, batch):
        n = batch["coords"].shape[0]
        cap = n // self.batch_size
        if cap not in self._fns:
            raise KeyError(
                f"no exported program for bucket {cap} "
                f"(have {sorted(self._fns)})")
        # Exported signature has opt_state=None pruned at trace time.
        state = state._replace(opt_state=None)
        return self._fns[cap](state, batch)
