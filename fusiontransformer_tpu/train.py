#!/usr/bin/env python
"""Training CLI (reference ``FusionTransformer/train.py``).

Same surface: ``python -m fusiontransformer_tpu.train --cfg <yaml> [KEY VALUE
...] [--run_name NAME] [--distributed 1]``.  The '@' in OUTPUT_DIR is replaced
with the config path (reference ``train.py:61-65``); dotted-key overrides merge
after the file.  ``--use_torchpack`` is accepted for CLI parity and maps to
the distributed (multi-chip) trainer path.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time
import warnings


def parse_args():
    parser = argparse.ArgumentParser(description="FusionTransformer-TPU training")
    parser.add_argument("--cfg", dest="config_file", default="",
                        metavar="FILE", help="path to config file", type=str)
    parser.add_argument("opts", help="Modify config options from the "
                        "command line", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--use_torchpack", default=False,
                        help="parity flag; selects the distributed trainer")
    parser.add_argument("--use_torchpack_test", default=False,
                        help="parity flag; distributed test path")
    parser.add_argument("--distributed", default=False,
                        help="train data-parallel over all visible devices")
    parser.add_argument("--run_name", default=None, help="name for the run")
    return parser.parse_args()


def load_cfg(config_file, opts):
    from fusiontransformer_tpu.config.defaults import get_default_cfg
    from fusiontransformer_tpu.utils.config import purge_cfg

    cfg = get_default_cfg()
    if config_file:
        cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(opts)
    purge_cfg(cfg)
    cfg.freeze()
    return cfg


def resolve_output_dir(cfg, config_file, run_name=None):
    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        config_path = osp.splitext(config_file)[0]
        output_dir = output_dir.replace("@", config_path.replace("configs/", ""))
        if osp.isdir(output_dir):
            warnings.warn("Output directory exists.")
    if run_name is None:
        run_name = time.strftime("MONTH_%m_DAY_%d_HOUR_%H_MIN_%M_SEC_%S")
    output_dir = os.path.join(output_dir, run_name)
    os.makedirs(output_dir, exist_ok=True)
    return output_dir, run_name


def main():
    args = parse_args()
    cfg = load_cfg(args.config_file, args.opts)
    output_dir, run_name = resolve_output_dir(cfg, args.config_file,
                                              args.run_name)
    print("output dir", output_dir)

    from fusiontransformer_tpu.utils.logger import setup_logger
    logger = setup_logger(
        "FusionTransformer", output_dir,
        comment="{}.train.{:s}".format(cfg["MODEL"]["TYPE"], run_name))

    import jax
    # Persistent XLA compile cache: cold flagship compiles are minutes; any
    # repeated run with the same shapes is seconds.
    import os as _os
    cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _os.path.expanduser("~/.cache/ftx_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    logger.info("%d device(s) available: %s", jax.device_count(),
                jax.devices())
    logger.info("Loaded configuration file %s", args.config_file)
    logger.info("Running with config:\n%s", cfg)

    # Crash hook (reference ``train.py:98-105``): on exception, finish the
    # wandb run so partial metrics upload, and — with FT_DEBUG=1 — drop into
    # the post-mortem debugger (pdb; ipdb when available) instead of dying.
    try:
        if args.use_torchpack or args.distributed:
            from fusiontransformer_tpu.modules.DistributedTrainer import (
                DistributedTrainer)
            trainer = DistributedTrainer(cfg, output_dir, run_name)
            trainer.train()
        elif args.use_torchpack_test:
            from fusiontransformer_tpu.modules.DistributedTrainer import (
                DistributedTrainer)
            trainer = DistributedTrainer(cfg, output_dir, run_name)
            trainer.test()
        else:
            from fusiontransformer_tpu.modules.SemanticTrainer import (
                SemanticTrainer)
            trainer = SemanticTrainer(cfg, output_dir, run_name)
            trainer.train()
    except Exception:
        logger.exception("training crashed")
        from fusiontransformer_tpu.utils import wandb_stub as wandb
        wandb.finish()
        if os.environ.get("FT_DEBUG"):
            import sys
            try:
                import ipdb as debugger
            except ImportError:
                import pdb as debugger
            debugger.post_mortem(sys.exc_info()[2])
        else:
            raise


if __name__ == "__main__":
    main()
