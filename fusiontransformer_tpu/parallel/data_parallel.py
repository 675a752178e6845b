"""Data parallelism over a device mesh (shard_map + psum).

TPU-native replacement for the reference's DDP/NCCL stack
(``modules/TorchpackInterface.py:44-81``, ``torchpack dist-run`` MPI launch):

* one process per host, a 1-D ``jax.sharding.Mesh`` over all local (or all
  global) devices with axis name ``data``;
* the per-device train step is the SAME function as the single-chip step
  (``modules/steps.py``) with ``axis_name='data'`` — gradients and batch-norm
  running stats are ``lax.pmean``'d, confusion matrices ``lax.psum``'d (the
  metric allreduce of ``TorchpackCallbacks.py:84-89``);
* scans are laid out contiguously in the padded batch, so sharding the
  leading axis hands each device whole scans; the per-device step re-bases
  scan ids so image gathers stay local.

Collectives ride ICI on a real slice; on CPU the same program runs over
``--xla_force_host_platform_device_count`` virtual devices (how the tests and
the driver's dry-run validate this path without hardware).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(num_devices: int = 0) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    assert n <= len(devices), (n, len(devices))
    return Mesh(np.array(devices[:n]), ("data",))


def initialize_distributed():
    """Multi-host bring-up: call once per process when JAX_COORDINATOR is set.

    Replaces `torchpack dist-run -np N` (MPI); JAX discovers peers via the
    coordinator address and exposes all chips in one global mesh.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def _localize_scan_ids(batch, scans_per_device: int):
    out = dict(batch)
    out["pt_batch"] = batch["pt_batch"] % scans_per_device
    return out


def shard_train_step(step_fn, mesh: Mesh, scans_per_device: int):
    """Wrap a per-device step (built with axis_name='data') for the mesh."""

    def per_device(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        batch = _localize_scan_ids(batch, scans_per_device)
        return step_fn(state, batch, rng)

    sharded = jax.shard_map(per_device, mesh=mesh,
                            in_specs=(P(), P("data"), P()),
                            out_specs=(P(), P()),
                            check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def shard_eval_step(step_fn, mesh: Mesh, scans_per_device: int):
    """Per-point predictions stay sharded (gathered on host); scalar losses
    are pmean'd and replicated."""

    def per_device(state, batch):
        batch = _localize_scan_ids(batch, scans_per_device)
        res = step_fn(state, batch)
        preds = {k: v for k, v in res.items() if k.startswith("pred_")}
        scalars = {k: jax.lax.pmean(v, "data") for k, v in res.items()
                   if not k.startswith("pred_")}
        return preds, scalars

    sharded = jax.jit(jax.shard_map(per_device, mesh=mesh,
                                    in_specs=(P(), P("data")),
                                    out_specs=(P("data"), P()),
                                    check_vma=False))

    def run(state, batch):
        preds, scalars = sharded(state, batch)
        return {**preds, **scalars}

    return run


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Place array leaves with leading-dim sharding over the data axis."""
    sharding = jax.sharding.NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
