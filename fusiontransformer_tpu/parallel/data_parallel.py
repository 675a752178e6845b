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
    """Multi-host bring-up: call once per process when JAX_COORDINATOR_ADDRESS
    is set.  Replaces ``torchpack dist-run -np N`` (MPI): processes rendezvous
    at the coordinator and every host sees one global device mesh.

    Launch (one process per host)::

        JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N \
        JAX_PROCESS_ID=<rank> python -m fusiontransformer_tpu.train ...

    On TPU pods, JAX auto-detects num_processes/process_id from the runtime,
    so only the coordinator address is required; the explicit env vars serve
    CPU/GPU clusters and the 2-process launcher test.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


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


def _spans_processes(mesh: Mesh) -> bool:
    return jax.process_count() > 1 and len(mesh.devices.ravel()) > len(
        jax.local_devices())


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh.

    Multi-host: every process holds the same host value (same RNG init /
    same checkpoint), so each builds its local shards via
    ``make_array_from_callback`` — the collective-free way to form a
    replicated global array.
    """
    sharding = jax.sharding.NamedSharding(mesh, P())
    if not _spans_processes(mesh):
        return jax.device_put(tree, sharding)

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(place, tree)


def shard_batch(batch, mesh: Mesh):
    """Place array leaves with leading-dim sharding over the data axis.

    Multi-host: each process passes its LOCAL scans (the per-process
    dataloader shard); the global array stacks them along the data axis in
    process order (DistributedSampler equivalent).
    """
    if not _spans_processes(mesh):
        sharding = jax.sharding.NamedSharding(mesh, P("data"))
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    sharding = jax.sharding.NamedSharding(mesh, P("data"))
    nproc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return {k: place(v) for k, v in batch.items()}
