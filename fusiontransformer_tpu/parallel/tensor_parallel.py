"""Tensor parallelism for the ViT stream (Megatron-style, shard_map + psum).

The reference is data-parallel only (SURVEY §2.3); this module goes beyond
parity: it shards the DeiT attention heads and MLP hidden dimension across a
``model`` mesh axis, composing with the existing ``data`` axis into a 2-D
``(data, model)`` mesh.  All collectives are explicit ``lax.psum`` over the
``model`` axis and ride ICI on a real slice.

Layout (per transformer block, embed d, heads h, tp ranks):

* ``attn/qkv``   — column-parallel: each rank holds h/tp heads' worth of
  q, k, v columns; no collective (input is replicated).
* ``attn/proj``  — row-parallel: each rank contracts its local head slice;
  one ``psum`` rebuilds the full output, bias added after the reduction.
* ``mlp/fc1``    — column-parallel over the 4d hidden dim.
* ``mlp/fc2``    — row-parallel + ``psum`` + bias.

Backward correctness uses the classic Megatron f/g conjugate pair
(:func:`replicate_fwd_psum_bwd` / :func:`psum_fwd_identity_bwd`): the f at
each block input turns per-rank partial cotangents into the full sum, so
gradients of *replicated* parameters (patch embed, layer norms, everything
outside the blocks) are bitwise identical on every model rank, while sharded
parameters keep purely local gradients — the optimizer can run rank-local
with no extra communication.

Everything outside the ViT blocks (the 3D stream, lifting, losses) is
replicated across ``model``; the ``data`` axis carries whole scans exactly
as in :mod:`fusiontransformer_tpu.parallel.data_parallel`.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fusiontransformer_tpu.parallel import data_parallel as dp


# --------------------------------------------------------------------------- #
# Megatron f / g: conjugate identity/psum pairs.
# Written as custom_vjp so the backward collective is explicit and does not
# depend on any particular psum-transpose convention.
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def replicate_fwd_psum_bwd(x, axis_name):
    """Megatron ``f``: identity forward; psum of cotangents backward.

    Place at the input of every column-parallel region whose input is
    replicated across ``axis_name`` — each rank's branch produces only a
    partial cotangent, and the psum restores the full one.
    """
    return x


def _f_fwd(x, axis_name):
    return x, None


def _f_bwd(axis_name, _, dout):
    return (jax.lax.psum(dout, axis_name),)


replicate_fwd_psum_bwd.defvjp(_f_fwd, _f_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_fwd_identity_bwd(x, axis_name):
    """Megatron ``g``: psum forward; identity backward.

    Place at the output of every row-parallel matmul: the forward sums the
    per-rank partial products; the backward hands every rank the (already
    replicated) cotangent unchanged.
    """
    return jax.lax.psum(x, axis_name)


def _g_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _g_bwd(axis_name, _, dout):
    return (dout,)


psum_fwd_identity_bwd.defvjp(_g_fwd, _g_bwd)


# --------------------------------------------------------------------------- #
# Parameter splitting: full (tp=1) ViT block params -> stacked [tp, ...]
# local shards, path-addressed so optimizer state trees can reuse the rules.
# --------------------------------------------------------------------------- #

def _is_block(seg: str) -> bool:
    return seg.startswith("block")


def _seg_name(entry) -> str:
    """Raw name of a tree-path entry (DictKey/SequenceKey/GetAttrKey/str)."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def tp_rule_for_path(path) -> str | None:
    """Return the split rule for a param path (tuple of path entries), or
    None for replicated leaves.

    Rules: 'qkv_kernel', 'qkv_bias', 'row_kernel' (proj/fc2 kernels),
    'col_kernel' (fc1 kernel), 'col_bias' (fc1 bias).  proj/fc2 biases are
    replicated (added once, after the psum).  Optimizer moment trees mirror
    the param tree, so the same rules address them.
    """
    segs = [_seg_name(s) for s in path]
    for i, s in enumerate(segs):
        if not _is_block(s):
            continue
        rest = segs[i + 1:]
        if rest[:2] == ["attn", "qkv"]:
            return "qkv_kernel" if rest[-1] == "kernel" else "qkv_bias"
        if rest[:2] == ["attn", "proj"]:
            return "row_kernel" if rest[-1] == "kernel" else None
        if rest[:2] == ["mlp", "fc1"]:
            return "col_kernel" if rest[-1] == "kernel" else "col_bias"
        if rest[:2] == ["mlp", "fc2"]:
            return "row_kernel" if rest[-1] == "kernel" else None
    return None


def _split_leaf(rule: str, x, tp: int, num_heads: int):
    """Full param -> stacked [tp, ...] per-rank shards (numpy/jnp)."""
    if rule == "qkv_kernel":
        d = x.shape[0]
        hd = d // num_heads
        hl = num_heads // tp
        # columns ordered (3, h, hd); take each rank's head slice.
        k = x.reshape(d, 3, num_heads, hd)
        return jnp.stack([
            k[:, :, r * hl:(r + 1) * hl, :].reshape(d, 3 * hl * hd)
            for r in range(tp)])
    if rule == "qkv_bias":
        d = x.shape[0] // 3
        hd = d // num_heads
        hl = num_heads // tp
        b = x.reshape(3, num_heads, hd)
        return jnp.stack([
            b[:, r * hl:(r + 1) * hl, :].reshape(3 * hl * hd)
            for r in range(tp)])
    if rule == "row_kernel":
        # rows ordered (h, hd) for proj, plain contiguous for fc2 — both are
        # a contiguous split once qkv columns are head-sliced the same way.
        rows = x.shape[0]
        rl = rows // tp
        return jnp.stack([x[r * rl:(r + 1) * rl] for r in range(tp)])
    if rule == "col_kernel":
        cols = x.shape[1]
        cl = cols // tp
        return jnp.stack([x[:, r * cl:(r + 1) * cl] for r in range(tp)])
    if rule == "col_bias":
        n = x.shape[0]
        nl = n // tp
        return jnp.stack([x[r * nl:(r + 1) * nl] for r in range(tp)])
    raise ValueError(rule)


def _merge_leaf(rule: str, x, num_heads: int):
    """Inverse of :func:`_split_leaf`: stacked [tp, ...] shards -> full param."""
    tp = x.shape[0]
    if rule == "qkv_kernel":
        d = x.shape[1]
        hd = d // num_heads
        hl = num_heads // tp
        # [tp, d, 3*hl*hd] -> concat the head axis back into (3, h, hd) cols.
        k = x.reshape(tp, d, 3, hl, hd)
        return jnp.concatenate([k[r] for r in range(tp)],
                               axis=2).reshape(d, 3 * num_heads * hd)
    if rule == "qkv_bias":
        hd = (x.shape[1] // 3) // (num_heads // tp)
        hl = num_heads // tp
        b = x.reshape(tp, 3, hl, hd)
        return jnp.concatenate([b[r] for r in range(tp)],
                               axis=1).reshape(3 * num_heads * hd)
    if rule == "row_kernel":
        return jnp.concatenate([x[r] for r in range(tp)], axis=0)
    if rule == "col_kernel":
        return jnp.concatenate([x[r] for r in range(tp)], axis=1)
    if rule == "col_bias":
        return jnp.concatenate([x[r] for r in range(tp)], axis=0)
    raise ValueError(rule)


def merge_params_from_tp(tree, num_heads: int):
    """Inverse of :func:`split_params_for_tp`: a tree whose TP leaves are
    stacked ``[tp, ...]`` maps back to the canonical full (tp=1) layout.

    Used to keep checkpoints TP-degree-independent (save merged, re-split on
    restore) and to run single-device eval on a TP-trained state."""
    def f(path, x):
        rule = tp_rule_for_path(path)
        if rule is None:
            return x
        return _merge_leaf(rule, x, num_heads)

    return jax.tree_util.tree_map_with_path(f, tree)


def split_params_for_tp(params, tp: int, num_heads: int):
    """Map a full (tp=1) param tree to one with TP leaves stacked [tp, ...].

    Non-ViT-block leaves are returned unchanged (replicated).  Works on any
    pytree of arrays whose dict paths contain the ViT block structure
    (``.../block{i}/attn/qkv/kernel`` etc.) — including optimizer moment
    trees, which mirror the param tree.
    """
    def f(path, x):
        rule = tp_rule_for_path(path)
        if rule is None:
            return x
        return _split_leaf(rule, x, tp, num_heads)

    return jax.tree_util.tree_map_with_path(f, params)


def specs_for_tp(tree, model_axis: str = "model"):
    """PartitionSpec pytree for shard_map in/out_specs: P(model_axis) on the
    stacked TP leaves (leading axis = rank), P() elsewhere."""
    def f(path, x):
        return P(model_axis) if tp_rule_for_path(path) is not None else P()

    return jax.tree_util.tree_map_with_path(f, tree)


def unstack_local(tree):
    """Inside shard_map: drop the leading length-1 rank axis of TP leaves."""
    def f(path, x):
        return x[0] if tp_rule_for_path(path) is not None else x

    return jax.tree_util.tree_map_with_path(f, tree)


def restack_local(tree):
    """Inverse of :func:`unstack_local` (for values returned to shard_map)."""
    def f(path, x):
        return x[None] if tp_rule_for_path(path) is not None else x

    return jax.tree_util.tree_map_with_path(f, tree)


# --------------------------------------------------------------------------- #
# 2-D (data, model) mesh + sharded train/eval steps.
# --------------------------------------------------------------------------- #

def make_mesh_2d(data: int, model: int) -> Mesh:
    """(data, model) mesh; on multi-host runs the model axis is pinned
    INTRA-host so its psum collectives ride ICI while only the data axis
    (gradient pmean) crosses DCN — the Megatron placement rule."""
    devices = jax.devices()
    n = data * model
    assert n <= len(devices), (n, len(devices))
    if jax.process_count() > 1:
        n_local = len(jax.local_devices())
        assert model <= n_local and n_local % model == 0, (
            f"TPU.MODEL_PARALLEL={model} must divide the {n_local} local "
            "devices: the model axis must stay intra-host (ICI)")
        # Process-major order -> consecutive same-host devices fill each
        # model row of the reshape.
        devices = sorted(devices,
                         key=lambda d: (d.process_index, getattr(d, "id", 0)))
    return Mesh(np.array(devices[:n]).reshape(data, model), ("data", "model"))


def place_state(tree, mesh: Mesh):
    """Explicitly place a TrainState pytree on the 2-D mesh: stacked TP
    leaves sharded over ``model`` (leading rank axis), everything else
    replicated.

    Single-host this is an ordinary device_put; multi-host every process
    holds the same canonical host values (same init / same checkpoint), so
    each builds its local shards via ``make_array_from_callback`` — the
    collective-free way to form the global arrays that multi-controller
    jit requires."""
    specs = specs_for_tp(tree)
    spans = jax.process_count() > 1 and len(mesh.devices.ravel()) > len(
        jax.local_devices())

    def f(x, spec):
        sharding = jax.sharding.NamedSharding(mesh, spec)
        if not spans:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(f, tree, specs)


def host_canonical(tree, num_heads: int):
    """TP-sharded (possibly multi-host global) tree -> canonical tp=1
    layout as HOST arrays, with no collectives.

    Works because the data axis replicates parameters across hosts: every
    host's local devices hold all ``model`` shards, so each leaf is fully
    addressable locally and can be assembled from ``addressable_shards``.
    Safe to call on any subset of ranks (checkpoint saving is rank-0-only;
    a collective merge there would deadlock)."""
    def leaf_to_host(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x)
        if x.is_fully_replicated:
            return np.asarray(x)
        out = np.empty(x.shape, x.dtype)
        covered = 0
        for sh in x.addressable_shards:
            out[sh.index] = np.asarray(sh.data)
            covered += np.asarray(sh.data).size
        assert covered >= out.size, (
            "leaf not fully addressable on this host — model axis must be "
            "intra-host (make_mesh_2d)")
        return out

    host = jax.tree_util.tree_map(leaf_to_host, tree)
    return jax.tree_util.tree_map(
        np.asarray, merge_params_from_tp(host, num_heads))


def shard_train_step_2d(step_fn, mesh: Mesh, scans_per_device: int):
    """Wrap a per-device train step for a (data, model) mesh.

    ``step_fn`` must be built with ``axis_name='data'`` (grad/metric
    reductions over data only — model-rank gradients are already full sums
    via the f/g pair) from a model constructed with ``tp=model_size,
    tp_axis='model'``.  The TrainState's TP leaves must be stacked
    ``[tp, ...]`` (see :func:`split_params_for_tp`).
    """
    def per_device(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        batch = dp._localize_scan_ids(batch, scans_per_device)
        state = unstack_local(state)
        new_state, metrics = step_fn(state, batch, rng)
        return restack_local(new_state), metrics

    cache = {}

    def wrap(state, batch, rng):
        if "fn" not in cache:
            specs = specs_for_tp(state)
            sharded = jax.shard_map(
                per_device, mesh=mesh,
                in_specs=(specs, P("data"), P()),
                out_specs=(specs, P()),
                check_vma=False)
            cache["fn"] = jax.jit(sharded, donate_argnums=(0,))
        return cache["fn"](state, batch, rng)

    return wrap


def shard_eval_step_2d(step_fn, mesh: Mesh, scans_per_device: int):
    """Eval analog: per-point predictions stay sharded over data; scalars
    are pmean'd over data (model ranks compute identical replicas)."""
    def per_device(state, batch):
        batch = dp._localize_scan_ids(batch, scans_per_device)
        res = step_fn(unstack_local(state), batch)
        preds = {k: v for k, v in res.items() if k.startswith("pred_")}
        scalars = {k: jax.lax.pmean(v, "data") for k, v in res.items()
                   if not k.startswith("pred_")}
        return preds, scalars

    cache = {}

    def wrap(state, batch):
        if "fn" not in cache:
            cache["fn"] = jax.jit(jax.shard_map(
                per_device, mesh=mesh,
                in_specs=(specs_for_tp(state), P("data")),
                out_specs=(P("data"), P()),
                check_vma=False))
        preds, scalars = cache["fn"](state, batch)
        return {**preds, **scalars}

    return wrap
