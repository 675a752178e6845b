"""AOT serving artifacts: exported programs == live engine, weight-agnostic."""

import numpy as np

from fusiontransformer_tpu.serving import InferenceEngine
from fusiontransformer_tpu.serving.export import export_predict
from tests.test_serving import _params, _record, _tiny_cfg
import pytest


@pytest.mark.slow
def test_exported_engine_matches_live(tmp_path):
    cfg = _tiny_cfg(buckets=(512, 1024))
    params, bs = _params(cfg, 1)
    out = str(tmp_path / "export")
    manifest = export_predict(cfg, params, bs, out, batch_size=1)
    assert sorted(manifest["buckets"]) == [512, 1024]

    live = InferenceEngine(cfg, params=params, batch_stats=bs)
    aot = InferenceEngine(cfg, params=params, batch_stats=bs,
                          exported_dir=out)
    for rec in (_record(30, n_points=400), _record(31)):
        np.testing.assert_array_equal(live.predict(rec)["labels"],
                                      aot.predict(rec)["labels"])
    assert aot.stats()["bucket_hits"][512] == 1


@pytest.mark.slow
def test_exported_artifact_is_weight_agnostic(tmp_path):
    """Weights are call arguments, not baked constants: the same artifact
    must produce different predictions under different checkpoints."""
    cfg = _tiny_cfg()
    params_a, bs = _params(cfg, 1)
    out = str(tmp_path / "export")
    export_predict(cfg, params_a, bs, out, batch_size=1)

    import jax
    params_b = jax.tree_util.tree_map(
        lambda x: x + np.float32(0.35) if np.issubdtype(
            np.asarray(x).dtype, np.floating) else x, params_a)
    rec = _record(32)
    a = InferenceEngine(cfg, params=params_a, batch_stats=bs,
                        exported_dir=out).predict(rec)
    b = InferenceEngine(cfg, params=params_b, batch_stats=bs,
                        exported_dir=out).predict(rec)
    assert (a["labels"] != b["labels"]).any()
