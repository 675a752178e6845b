"""ZeRO-1 optimizer-state sharding over the ``data`` mesh axis.

Beyond-parity capability (the reference replicates optimizer state per GPU
under DDP): each data rank stores ``1/n`` of every optimizer moment tensor
(Adam ``mu``/``nu``, SGD ``trace``).  The train step is unchanged up to the
optimizer: gradients are ``pmean``'d as before (``modules/steps.py:208``),
then the :func:`zero1`-wrapped transformation

* slices this rank's chunk out of the (full, replicated) grads and params,
* runs the inner optax update on the chunk — elementwise optimizers give
  bitwise-identical results on shards,
* ``all_gather``\\ s the chunk updates back to full updates for
  ``optax.apply_updates``.

Scalar state (Adam ``count``, the injected learning rate) stays replicated,
so the per-epoch ``set_learning_rate`` host mutation keeps working.

Memory: optimizer state drops from 2x params to 2x params / n per chip.
Communication: one extra params-sized ``all_gather`` per step (the grad
``pmean`` is unchanged; fusing it into a ``reduce_scatter`` is the ZeRO-2
step, not done here).

Layout: the canonical (``tx.init(params)``) state maps to a stacked tree
whose array leaves are ``[n, chunk]`` (flattened, zero-padded, row per rank)
— shard with ``P('data')``; scalar leaves stay replicated (``P()``).
Checkpoints store the canonical layout (:func:`merge_opt_state` on save,
:func:`split_opt_state` after restore), so they are ZeRO-degree independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P


def _chunk(size: int, n: int) -> int:
    return -(-size // n)


def shard_flags(canonical_opt_state):
    """Pytree of bools: True for array leaves (sharded), False for scalars
    (count / injected hyperparams — replicated)."""
    return jax.tree_util.tree_map(lambda x: np.ndim(x) >= 1,
                                  canonical_opt_state)


def split_opt_state(canonical, n: int):
    """Canonical optax state -> ZeRO layout ([n, chunk] array leaves)."""
    def f(flag, x):
        if not flag:
            return x
        flat = jnp.asarray(x).reshape(-1)
        c = _chunk(flat.size, n)
        flat = jnp.pad(flat, (0, c * n - flat.size))
        return flat.reshape(n, c)

    return jax.tree_util.tree_map(f, shard_flags(canonical), canonical)


def merge_opt_state(stacked, canonical_shapes):
    """ZeRO layout -> canonical, given a shape-template tree (e.g. from
    ``jax.eval_shape(tx.init, params)`` or the pre-split state)."""
    def f(tmpl, x):
        shape = tuple(getattr(tmpl, "shape", ()))
        if len(shape) == 0:          # replicated scalar (count, lr)
            return x
        size = int(np.prod(shape))
        return jnp.asarray(x).reshape(-1)[:size].reshape(shape)

    return jax.tree_util.tree_map(f, canonical_shapes, stacked)


def opt_state_specs(canonical, model_axis: str = "data"):
    """PartitionSpec tree for the ZeRO-layout state."""
    return jax.tree_util.tree_map(
        lambda flag: P(model_axis) if flag else P(),
        shard_flags(canonical))


def unstack_local_opt(stacked_flags, tree):
    """Inside shard_map: [1, chunk] sharded leaves -> [chunk]."""
    return jax.tree_util.tree_map(
        lambda flag, x: x[0] if flag else x, stacked_flags, tree)


def restack_local_opt(stacked_flags, tree):
    return jax.tree_util.tree_map(
        lambda flag, x: x[None] if flag else x, stacked_flags, tree)


def zero1(tx, axis_name: str, n: int):
    """Wrap an optax transformation so its state is the per-rank chunk.

    ``update`` takes FULL (already pmean'd) grads and FULL params, returns
    FULL updates; only the state it threads is chunk-sized.  Must run inside
    shard_map over ``axis_name``.
    """
    def shard_leaf(x, r):
        flat = x.reshape(-1)
        c = _chunk(flat.size, n)
        flat = jnp.pad(flat, (0, c * n - flat.size))
        return jax.lax.dynamic_slice(flat, (r * c,), (c,))

    def init(params):
        raise NotImplementedError(
            "split a canonical tx.init(params) state with split_opt_state "
            "instead (the trainer initializes host-side)")

    def update(grads, state, params=None):
        r = jax.lax.axis_index(axis_name)
        gs = jax.tree_util.tree_map(lambda g: shard_leaf(g, r), grads)
        ps = (None if params is None else
              jax.tree_util.tree_map(lambda p: shard_leaf(p, r), params))
        sh_updates, new_state = tx.update(gs, state, ps)

        def unshard(u, g):
            full = jax.lax.all_gather(u, axis_name)      # [n, chunk]
            return full.reshape(-1)[:g.size].reshape(g.shape)

        updates = jax.tree_util.tree_map(unshard, sh_updates, grads)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def shard_train_step_zero1(step_fn, mesh, scans_per_device: int,
                           canonical_opt_state):
    """DP train-step wrapper with ZeRO-1 state: like
    :func:`data_parallel.shard_train_step` but the TrainState's opt_state
    leaves arrive in the stacked [n, chunk] layout (specs from
    :func:`opt_state_specs`) and are unstacked per rank.

    ``step_fn`` must be built with the :func:`zero1`-wrapped transformation
    and ``axis_name='data'``.
    """
    from fusiontransformer_tpu.parallel import data_parallel as dp

    flags = shard_flags(canonical_opt_state)
    specs_opt = opt_state_specs(canonical_opt_state)

    def per_device(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        batch = dp._localize_scan_ids(batch, scans_per_device)
        state = state._replace(
            opt_state=unstack_local_opt(flags, state.opt_state))
        new_state, metrics = step_fn(state, batch, rng)
        new_state = new_state._replace(
            opt_state=restack_local_opt(flags, new_state.opt_state))
        return new_state, metrics

    cache = {}

    def wrap(state, batch, rng):
        if "fn" not in cache:
            state_specs = type(state)(
                *[specs_opt if name == "opt_state" else P()
                  for name in state._fields])
            sharded = jax.shard_map(
                per_device, mesh=mesh,
                in_specs=(state_specs, P("data"), P()),
                out_specs=(state_specs, P()),
                check_vma=False)
            cache["fn"] = jax.jit(sharded, donate_argnums=(0,))
        return cache["fn"](state, batch, rng)

    return wrap
