#!/usr/bin/env python
"""Serve a trained FusionTransformer-TPU model over HTTP.

Examples:
  # Serve the flagship from a checkpoint:
  python tools/serve.py --cfg configs/semantic_kitti/middlefusion.yaml \\
      --ckpt /path/to/model_000100 --port 8433

  # Hermetic self-test (random-init tiny model, synthetic scans, in-process
  # HTTP client) — also the smoke test the CI can run:
  python tools/serve.py --cfg configs/semantic_kitti/synthetic.yaml \\
      --selftest 8

The request payload is an .npz with the preprocessed-pickle schema
(reference ``data/semantic_kitti/preprocess.py:154-167``): ``points`` [N,3]
float32 lidar meters, ``feats`` [N,≤4] float32, ``img`` HxWx3 float32 (or
uint8), ``points_img`` [N,2] int (row, col).  The response .npz carries
``labels`` ([N] train-id per input point; 0 = ignore for points outside the
camera frustum) plus per-modality ``labels_2d``/``labels_3d`` and the
``in_frustum`` mask.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="FusionTransformer-TPU server")
    p.add_argument("--cfg", required=True, help="config file path")
    p.add_argument("--ckpt", default="", help="checkpoint path (empty = "
                   "random init, only sensible with --selftest)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8433)
    p.add_argument("--batch", type=int, default=1,
                   help="device batch size (flagship optimum is 1; the 2D-"
                        "only stream benefits from 8)")
    p.add_argument("--preproc-workers", type=int, default=2)
    p.add_argument("--exported-dir", default="", help="AOT artifact dir from "
                   "tools/export_model.py (skips Python tracing at startup)")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--selftest", type=int, default=0, metavar="N",
                   help="run N synthetic scans through the full HTTP stack "
                        "and exit")
    p.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    return p.parse_args()


def main():
    args = parse_args()

    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.utils.config import purge_cfg

    cfg = get_default_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    purge_cfg(cfg)
    cfg.freeze()

    import jax

    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.serving import InferenceEngine, InferenceServer
    from fusiontransformer_tpu.serving.server import HTTPFrontend

    if args.ckpt:
        engine = InferenceEngine(cfg, checkpoint_path=args.ckpt,
                                 batch_size=args.batch,
                                 exported_dir=args.exported_dir)
    else:
        print("WARNING: no --ckpt, serving a random-init model",
              file=sys.stderr)
        model = build_model(cfg)[0]
        state = init_train_state(cfg, model, None, args.batch, cfg.RNG_SEED)
        engine = InferenceEngine(cfg, params=state.params,
                                 batch_stats=state.batch_stats,
                                 batch_size=args.batch,
                                 exported_dir=args.exported_dir)

    if not args.no_warmup:
        print("warmup (compiling one program per capacity bucket)...",
              file=sys.stderr)
        times = engine.warmup()
        for b, t in sorted(times.items()):
            print(f"  bucket {b}: {t:.1f}s", file=sys.stderr)

    server = InferenceServer(engine, preproc_workers=args.preproc_workers)
    frontend = HTTPFrontend(server, host=args.host, port=args.port).start()
    print(f"serving on http://{args.host}:{frontend.port}", file=sys.stderr)

    if args.selftest:
        rc = _selftest(cfg, frontend.port, args.selftest)
        frontend.close()
        server.close()
        sys.exit(rc)

    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        frontend.close()
        server.close()


def _selftest(cfg, port, n_scans):
    """Fire synthetic scans through the HTTP stack; verify + report latency."""
    import urllib.request

    import numpy as np

    from fusiontransformer_tpu.data.synthetic import SyntheticSCN
    from fusiontransformer_tpu.serving.server import decode_npz, encode_record

    ds_cfg = dict(cfg.DATASET.get(cfg.DATASET.TYPE, {}))
    h = ds_cfg.get("image_height", 370)
    w = ds_cfg.get("image_width", 1226)
    gen = SyntheticSCN(split=("test",), num_scans=n_scans,
                       num_points=min(4096, cfg.TPU.POINT_CAPACITY),
                       image_height=h, image_width=w,
                       num_classes=cfg.MODEL.NUM_CLASSES)

    url = f"http://127.0.0.1:{port}"
    ok = 0
    for i in range(n_scans):
        rng = np.random.RandomState(1000 + i)
        points, _, _ = gen._make_scan(rng)
        record = {
            "points": points,
            "feats": np.concatenate(
                [points, rng.rand(len(points), 1).astype(np.float32)], 1),
            "img": rng.rand(h, w, 3).astype(np.float32),
            "points_img": gen._project(points),
        }
        body = encode_record(record)
        req = urllib.request.Request(url + "/predict", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = decode_npz(resp.read())
        labels = out["labels"]
        assert labels.shape == (len(points),), labels.shape
        assert labels.min() >= 0 and labels.max() < cfg.MODEL.NUM_CLASSES
        ok += 1

    with urllib.request.urlopen(url + "/stats", timeout=60) as resp:
        stats = json.loads(resp.read())
    print(json.dumps({"selftest_scans_ok": ok, **stats}, indent=2))
    return 0 if ok == n_scans else 1


if __name__ == "__main__":
    main()
