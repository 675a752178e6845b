#!/usr/bin/env python
"""Export AOT serving artifacts (StableHLO per capacity bucket).

    python tools/export_model.py --cfg configs/semantic_kitti/middlefusion.yaml \\
        --ckpt /path/to/model_000100 --out /path/to/export_dir [--batch 1]

The artifact directory is consumed by
``InferenceEngine(cfg, params=..., exported_dir=...)`` or
``tools/serve.py --exported-dir``; weights are NOT baked in (the programs
take variables as call arguments), so one artifact serves every checkpoint
of the same config.  Export on the platform you will serve on.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", default="", help="checkpoint for shapes/weights "
                   "(empty = random init shapes)")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("opts", nargs="*")
    args = p.parse_args()

    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.utils.config import purge_cfg

    cfg = get_default_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    purge_cfg(cfg)
    cfg.freeze()

    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.serving.export import export_predict

    if args.ckpt:
        from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2
        payload = CheckpointerV2(save_dir="").load(args.ckpt, resume=False)
        params, batch_stats = payload["params"], payload.get("batch_stats", {})
    else:
        print("WARNING: no --ckpt, exporting with random-init shapes",
              file=sys.stderr)
        model = build_model(cfg)[0]
        state = init_train_state(cfg, model, None, args.batch, cfg.RNG_SEED)
        params, batch_stats = state.params, state.batch_stats

    manifest = export_predict(cfg, params, batch_stats, args.out,
                              batch_size=args.batch)
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
