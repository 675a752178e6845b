#!/usr/bin/env python
"""Test/eval CLI (reference ``FusionTransformer/test.py``; its ``self.cfg``
free-function bug at ``test.py:43`` is fixed here).

``python -m fusiontransformer_tpu.test --cfg <yaml> --ckpt <path> [KEY VALUE]``
Loads the checkpoint (or the last one via the manifest), runs ``validate`` on
the test split, prints per-class IoU tables.
"""

from __future__ import annotations

import argparse
import logging
import os
import os.path as osp
import socket
import time
import warnings


def parse_args():
    parser = argparse.ArgumentParser(description="FusionTransformer-TPU test")
    parser.add_argument("--cfg", dest="config_file", default="",
                        metavar="FILE", type=str)
    parser.add_argument("--ckpt", type=str,
                        help="path to checkpoint file of the model")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args()


def test(cfg, args, output_dir=""):
    import jax

    from fusiontransformer_tpu.data.build import build_dataloader
    from fusiontransformer_tpu.data.utils.validate import validate
    from fusiontransformer_tpu.models.build import build_model
    from fusiontransformer_tpu.modules.SemanticTrainer import init_train_state
    from fusiontransformer_tpu.modules.steps import TrainState, make_eval_step
    from fusiontransformer_tpu.utils.checkpoint import CheckpointerV2
    from fusiontransformer_tpu.utils.metric_logger import MetricLogger

    logger = logging.getLogger(
        "FusionTransformer.{}.test".format(cfg["MODEL"]["TYPE"]))

    model = build_model(cfg)[0]
    state = init_train_state(cfg, model, None, cfg.TEST.BATCH_SIZE,
                             cfg.RNG_SEED)

    checkpointer = CheckpointerV2(save_dir=output_dir, logger=logger)
    if args.ckpt:
        weight_path = args.ckpt.replace("@", output_dir)
        payload = checkpointer.load(weight_path, resume=False)
    else:
        payload = checkpointer.load(None, resume=True)
    if payload:
        state = TrainState(payload.get("params", state.params),
                           payload.get("batch_stats", state.batch_stats),
                           None, state.step)

    test_dataloader = build_dataloader(cfg, mode="test")
    eval_fn, _ = make_eval_step(cfg, model, cfg.TEST.BATCH_SIZE)
    eval_step = jax.jit(eval_fn)

    test_metric_logger = MetricLogger(delimiter="  ")
    validate(cfg, eval_step, state, test_dataloader, test_metric_logger,
             logger_name=logger.name)
    logger.info("Test %s", test_metric_logger.summary_str)
    return test_metric_logger


def main():
    args = parse_args()
    from fusiontransformer_tpu.train import load_cfg
    cfg = load_cfg(args.config_file, args.opts)

    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        config_path = osp.splitext(args.config_file)[0]
        output_dir = output_dir.replace("@",
                                        config_path.replace("configs/", ""))
        if not osp.isdir(output_dir):
            warnings.warn(f"Make a new directory: {output_dir}")
            os.makedirs(output_dir, exist_ok=True)

    run_name = "{:s}.{:s}".format(time.strftime("%m-%d_%H-%M-%S"),
                                  socket.gethostname())
    from fusiontransformer_tpu.utils.logger import setup_logger
    logger = setup_logger(
        "FusionTransformer", output_dir,
        comment="{}.test.{:s}".format(cfg["MODEL"]["TYPE"], run_name))
    logger.info("Loaded configuration file %s", args.config_file)
    test(cfg, args, output_dir)


if __name__ == "__main__":
    main()
