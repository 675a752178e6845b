"""Distributed entry points, reference-API parity shim.

The reference exposes ``TorchpackInterface.main(cfg, output_dir, run_name)``
and ``.test(...)`` (``modules/TorchpackInterface.py:39,149``) wrapping the
torchpack/DDP stack.  Here both delegate to the shard_map-based
``DistributedTrainer`` so existing call sites keep working verbatim.
"""

from __future__ import annotations

from fusiontransformer_tpu.modules.DistributedTrainer import DistributedTrainer


def main(cfg, output_dir, run_name):
    trainer = DistributedTrainer(cfg, output_dir, run_name)
    trainer.train()
    return trainer


def test(cfg, output_dir, run_name):
    trainer = DistributedTrainer(cfg, output_dir, run_name)
    return trainer.test()
