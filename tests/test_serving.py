"""Serving runtime tests: engine correctness, batching server, HTTP stack.

The engine must be a pure function of the scan: batching, bucket routing,
thread scheduling and transport must never change a prediction.
"""

import threading

import numpy as np
import pytest

from fusiontransformer_tpu.config.defaults import get_default_cfg
from fusiontransformer_tpu.data.synthetic import SyntheticSCN
from fusiontransformer_tpu.models.build import build_model
from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
from fusiontransformer_tpu.serving import InferenceEngine, InferenceServer

H, W = 40, 60
N_POINTS = 900


def _tiny_cfg(point_capacity=1024, buckets=()):
    cfg = get_default_cfg()
    cfg.MODEL.TYPE = "MiddleFusionTransformer"
    cfg.MODEL.DUAL_HEAD = True
    cfg.MODEL.NUM_CLASSES = 20
    cfg.MODEL.USE_IMAGE = True
    cfg.MODEL.USE_LIDAR = True
    cfg.MODEL.USE_FUSION = True
    cfg.MODEL.middle_feat_block_number = 0
    cfg.MODEL.late_feat_block_number = 1
    cfg.MODEL.VIT_IMG_SIZE = 32
    cfg.MODEL.VIT_PATCH = 16
    cfg.MODEL.VIT_EMBED_DIM = 64
    cfg.MODEL.VIT_DEPTH = 2
    cfg.MODEL.VIT_HEADS = 2
    cfg.DATASET.TYPE = "SyntheticSCN"
    cfg.DATASET.SyntheticSCN.image_height = H
    cfg.DATASET.SyntheticSCN.image_width = W
    cfg.DATASET.SyntheticSCN.num_points = N_POINTS
    cfg.TPU.POINT_CAPACITY = point_capacity
    cfg.TPU.CAPACITY_BUCKETS = tuple(buckets)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    return cfg


def _params(cfg, batch_size):
    model = build_model(cfg)[0]
    state = init_train_state(cfg, model, None, batch_size, rng_seed=3)
    return state.params, state.batch_stats


def _record(i, n_points=N_POINTS):
    gen = SyntheticSCN(split=("test",), num_scans=1, num_points=n_points,
                       image_height=H, image_width=W)
    rng = np.random.RandomState(100 + i)
    points, _, _ = gen._make_scan(rng)
    return {
        "points": points,
        "feats": np.concatenate(
            [points, rng.rand(len(points), 1).astype(np.float32)], 1),
        "img": rng.rand(H, W, 3).astype(np.float32),
        "points_img": gen._project(points),
    }


@pytest.fixture(scope="module")
def engine():
    cfg = _tiny_cfg()
    params, bs = _params(cfg, 1)
    return InferenceEngine(cfg, params=params, batch_stats=bs, batch_size=1)


@pytest.mark.slow
def test_predict_shapes_and_determinism(engine):
    rec = _record(0)
    out1 = engine.predict(rec)
    out2 = engine.predict(rec)
    n = len(rec["points"])
    for key in ("labels", "labels_2d", "labels_3d"):
        assert out1[key].shape == (n,)
        assert out1[key].min() >= 0
        assert out1[key].max() < 20
        np.testing.assert_array_equal(out1[key], out2[key])
    # Out-of-frustum points carry the ignore id (validate.py convention).
    assert out1["in_frustum"].dtype == bool
    np.testing.assert_array_equal(out1["labels"][~out1["in_frustum"]], 0)
    stats = engine.stats()
    assert stats["scans"] >= 2
    assert stats["voxel_overflow"] == 0
    assert stats["collate_dropped_points"] == 0


@pytest.mark.slow
def test_batching_does_not_change_predictions():
    cfg = _tiny_cfg()
    params, bs = _params(cfg, 2)
    eng1 = InferenceEngine(cfg, params=params, batch_stats=bs, batch_size=1)
    eng2 = InferenceEngine(cfg, params=params, batch_stats=bs, batch_size=2)
    recs = [_record(1), _record(2)]
    solo = [eng1.predict(r) for r in recs]
    batched = eng2.predict_batch(recs)
    for s, b in zip(solo, batched):
        np.testing.assert_array_equal(s["labels"], b["labels"])
    # A partially-filled batch must also match.
    half = eng2.predict(recs[0])
    np.testing.assert_array_equal(half["labels"], solo[0]["labels"])


@pytest.mark.slow
def test_bucket_routing_is_lossless():
    params, bs = _params(_tiny_cfg(), 1)
    fixed = InferenceEngine(_tiny_cfg(), params=params, batch_stats=bs)
    bucketed = InferenceEngine(_tiny_cfg(buckets=(512, 1024)),
                               params=params, batch_stats=bs)
    small = _record(3, n_points=420)   # fits the 512 bucket
    np.testing.assert_array_equal(fixed.predict(small)["labels"],
                                  bucketed.predict(small)["labels"])
    assert bucketed.stats()["bucket_hits"][512] == 1
    big = _record(4)                   # needs the 1024 bucket
    np.testing.assert_array_equal(fixed.predict(big)["labels"],
                                  bucketed.predict(big)["labels"])
    assert bucketed.stats()["bucket_hits"][1024] == 1


@pytest.mark.slow
def test_warmup_compiles_every_bucket():
    cfg = _tiny_cfg(buckets=(512, 1024))
    params, bs = _params(cfg, 1)
    eng = InferenceEngine(cfg, params=params, batch_stats=bs)
    times = eng.warmup()
    assert sorted(times) == [512, 1024]
    st = eng.stats()   # warmup must not pollute serving stats
    assert st["scans"] == 0 and st["batches"] == 0


@pytest.mark.slow
def test_sharded_engine_matches_single_device():
    """num_devices=4: whole-scan data sharding must not change predictions
    (device-local gathers, rebased scan ids) — the serving analog of the
    sharded-eval bit-match in test_data_parallel."""
    cfg = _tiny_cfg()
    params, bs = _params(cfg, 4)
    single = InferenceEngine(cfg, params=params, batch_stats=bs,
                             batch_size=4)
    sharded = InferenceEngine(cfg, params=params, batch_stats=bs,
                              batch_size=4, num_devices=4)
    recs = [_record(40 + i) for i in range(4)]
    for s, d in zip(single.predict_batch(recs), sharded.predict_batch(recs)):
        np.testing.assert_array_equal(s["labels"], d["labels"])
    assert sharded.stats()["voxel_overflow"] == 0


@pytest.mark.slow
def test_server_concurrent_matches_serial():
    cfg = _tiny_cfg()
    params, bs = _params(cfg, 2)
    eng = InferenceEngine(cfg, params=params, batch_stats=bs, batch_size=2)
    recs = [_record(10 + i) for i in range(6)]
    serial = [eng.predict(r)["labels"] for r in recs]

    server = InferenceServer(eng, preproc_workers=2, batch_wait_ms=5.0)
    try:
        futs = [None] * len(recs)

        def submit(i):
            futs[i] = server.submit(recs[i])

        threads = [threading.Thread(target=submit, args=(i,))
                   for i in range(len(recs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, fut in enumerate(futs):
            np.testing.assert_array_equal(fut.result(timeout=300)["labels"],
                                          serial[i])
        stats = server.stats()
        assert stats["requests_completed"] == len(recs)
        assert "latency_ms" in stats and stats["latency_ms"]["p50"] > 0
    finally:
        server.close()


def test_http_roundtrip():
    import urllib.request

    from fusiontransformer_tpu.serving.server import (HTTPFrontend,
                                                      decode_npz,
                                                      encode_record)

    cfg = _tiny_cfg()
    params, bs = _params(cfg, 1)
    eng = InferenceEngine(cfg, params=params, batch_stats=bs)
    rec = _record(20)
    want = eng.predict(rec)["labels"]

    server = InferenceServer(eng)
    frontend = HTTPFrontend(server, port=0).start()
    try:
        url = f"http://127.0.0.1:{frontend.port}"
        req = urllib.request.Request(url + "/predict",
                                     data=encode_record(rec), method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = decode_npz(resp.read())
        np.testing.assert_array_equal(out["labels"], want)
        with urllib.request.urlopen(url + "/healthz", timeout=60) as resp:
            assert resp.read() == b"ok"
    finally:
        frontend.close()
        server.close()
