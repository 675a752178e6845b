"""Pipeline parallelism for the ViT stream (GPipe schedule, shard_map + ppermute).

Beyond-parity capability (the reference is DP-only, SURVEY §2.3): the DeiT
blocks are partitioned into contiguous stages over a ``pipe`` mesh axis; a
batch is split into microbatches that flow through the stages in the classic
GPipe schedule — at tick ``t`` stage ``s`` processes microbatch ``t - s`` and
hands its activation to stage ``s+1`` with a ``ppermute``.  All ranks run the
same program (SPMD): inactive (bubble) ticks compute on don't-care data and
their writes are masked out.

Differentiation needs no hand-written schedule: JAX transposes the
``lax.scan`` + ``ppermute`` chain into the reverse-order backward pipeline
automatically; the two Megatron-style custom-vjp collectives from
:mod:`fusiontransformer_tpu.parallel.tensor_parallel` pin down the only two
subtle spots:

* ``replicate_fwd_psum_bwd`` at the (replicated) embedding output makes the
  embedding/pos/cls parameter gradients full sums, bitwise identical on every
  pipe rank;
* ``psum_fwd_identity_bwd`` broadcasts the last stage's outputs (and each tap
  owner's taps) to all ranks — each buffer has exactly one writer, the rest
  contribute zeros.

Stage parameters are stage-local: the optimizer can run rank-local on the
``[S, L, ...]``-stacked block tree with no gradient collectives on the pipe
axis.

The DeiT-B stream in the flagship fusion model is ~3 ms/step — pipelining it
buys nothing there; this module is scale infrastructure (deep ViTs, long
token sequences) and is validated for exactness against the sequential
backbone in ``tests/test_pipeline_parallel.py``.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fusiontransformer_tpu.models.vit import Block, VisionTransformer2D
from fusiontransformer_tpu.parallel.tensor_parallel import (
    psum_fwd_identity_bwd, replicate_fwd_psum_bwd)


def make_pp_mesh(n_stages: int) -> Mesh:
    devices = jax.devices()
    assert n_stages <= len(devices), (n_stages, len(devices))
    return Mesh(np.array(devices[:n_stages]), ("pipe",))


def stack_vit_blocks(params, n_stages: int):
    """Split a canonical ViT param tree into (staged_blocks, rest).

    ``staged_blocks`` stacks the per-block trees along a new leading axis and
    reshapes it to ``[n_stages, blocks_per_stage, ...]`` — shard the leading
    axis with ``P('pipe')``.  ``rest`` (patch embed, tokens, pos embed) stays
    replicated.
    """
    names = sorted((k for k in params if k.startswith("block")),
                   key=lambda k: int(k[len("block"):]))
    depth = len(names)
    assert depth % n_stages == 0, (depth, n_stages)
    blocks = [params[k] for k in names]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    staged = jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, depth // n_stages, *x.shape[1:]),
        stacked)
    rest = {k: v for k, v in params.items() if not k.startswith("block")}
    return staged, rest


def unstack_vit_blocks(staged, rest):
    """Inverse of :func:`stack_vit_blocks` (host-side; for checkpoints)."""
    leaves = jax.tree_util.tree_leaves(staged)
    n_stages, per_stage = leaves[0].shape[:2]
    params = dict(rest)
    for s in range(n_stages):
        for j in range(per_stage):
            params[f"block{s * per_stage + j}"] = jax.tree_util.tree_map(
                lambda x: x[s, j], staged)
    return params


def _embed(vit: VisionTransformer2D, rest, images):
    """Patch-embed + prefix tokens + pos embed (mirrors
    ``VisionTransformer2D.__call__`` lines 130-156 functionally; exactness is
    pinned by the parity test)."""
    b = images.shape[0]
    p = vit.patch_size
    g = vit.img_size // p
    n_patches = g * g
    cdt = vit.compute_dtype

    x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, n_patches, p * p * 3)
    pe = rest["patch_embed"]
    x = jnp.dot(x.astype(cdt), pe["kernel"].astype(cdt),
                preferred_element_type=jnp.float32) + pe["bias"]

    prefix = [jnp.broadcast_to(rest["cls_token"], (b, 1, vit.embed_dim))]
    if vit.distilled:
        prefix.append(jnp.broadcast_to(rest["dist_token"],
                                       (b, 1, vit.embed_dim)))
    x = jnp.concatenate(prefix + [x], axis=1)
    return x + rest["pos_embed"]


def pp_vit_apply(vit: VisionTransformer2D, staged_local, rest, images,
                 n_stages: int, n_micro: int,
                 tap_blocks: Sequence[int]) -> Dict[str, jnp.ndarray]:
    """GPipe forward of the ViT *inside* shard_map over the ``pipe`` axis.

    ``staged_local``: this rank's block stack, leaves ``[1, L, ...]`` (the
    shard_map-localized slice of :func:`stack_vit_blocks`'s output).
    ``images``: replicated ``[B, H, W, 3]`` with ``B % n_micro == 0``.
    Returns ``{str(k): tokens}`` for each requested tap block, replicated on
    every rank, identical to the sequential backbone's taps.
    """
    depth = vit.depth
    per_stage = depth // n_stages
    n_prefix = 2 if vit.distilled else 1
    b = images.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    # Sorted so the carry dict's pytree order matches insertion order.
    tap_blocks = tuple(sorted({int(k) for k in tap_blocks}))

    s_idx = jax.lax.axis_index("pipe")
    local_blocks = jax.tree_util.tree_map(lambda x: x[0], staged_local)
    block_def = Block(vit.embed_dim, vit.num_heads,
                      compute_dtype=vit.compute_dtype)
    block_apply = block_def.apply
    if vit.remat:
        block_apply = jax.checkpoint(block_apply)

    x_embed = _embed(vit, rest, images)
    n_tok = x_embed.shape[1]
    d = x_embed.shape[2]
    # Megatron f: the embedding is consumed (masked) on rank 0 only; the
    # backward psum makes embed-param grads full and replicated on all ranks.
    x_embed = replicate_fwd_psum_bwd(x_embed, "pipe")
    x_embed = x_embed.reshape(n_micro, mb, n_tok, d)

    def run_stage(x, active):
        """Apply this rank's L blocks; collect requested taps (masked to the
        ticks where this rank both owns the tap block and is active)."""
        def step(carry, xs):
            bp, j = xs
            x, taps = carry
            y = block_apply({"params": bp}, x)
            k_abs = s_idx * per_stage + j
            taps = tuple(
                jnp.where((k_abs == k) & active, y, t)
                for k, t in zip(tap_blocks, taps))
            return (y, taps), None

        zero_taps = tuple(jnp.zeros_like(x) for _ in tap_blocks)
        (y, taps), _ = jax.lax.scan(
            step, (x, zero_taps), (local_blocks, jnp.arange(per_stage)))
        return y, taps

    T = n_stages + n_micro - 1
    out0 = jnp.zeros((n_micro, mb, n_tok, d), jnp.float32)
    taps0 = {k: jnp.zeros((n_micro, mb, n_tok, d), jnp.float32)
             for k in tap_blocks}
    recv0 = jnp.zeros((mb, n_tok, d), jnp.float32)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        recv, out, tap_bufs = carry
        m = t - s_idx                        # this rank's microbatch index
        active = (m >= 0) & (m < n_micro)
        mc = jnp.clip(m, 0, n_micro - 1)
        x_in = jnp.where(s_idx == 0, x_embed[mc], recv)
        y, taps = run_stage(x_in, active)
        last = s_idx == n_stages - 1
        out = out.at[mc].set(jnp.where(last & active, y, out[mc]))
        tap_bufs = {k: buf.at[mc].set(jnp.where(
            (s_idx == k // per_stage) & active, taps[i], buf[mc]))
            for i, (k, buf) in enumerate(tap_bufs.items())}
        if perm:
            send = jax.lax.ppermute(y, "pipe", perm)
        else:
            send = y
        return (send, out, tap_bufs), None

    (_, out, tap_bufs), _ = jax.lax.scan(
        tick, (recv0, out0, taps0), jnp.arange(T))

    # Megatron g: one writer per buffer, zeros elsewhere — psum broadcasts
    # the result to every rank; backward hands the cotangent through.
    def collect(buf):
        buf = psum_fwd_identity_bwd(buf, "pipe")
        return buf.reshape(b, n_tok, d)[:, n_prefix:, :]

    outputs = {str(k): collect(buf) for k, buf in tap_bufs.items()}
    if str(depth - 1) not in outputs:
        outputs[str(depth - 1)] = collect(out)
    return outputs


def make_pp_forward(vit: VisionTransformer2D, mesh: Mesh, n_micro: int,
                    tap_blocks: Sequence[int]):
    """jit(shard_map(...)) wrapper: ``fn(staged, rest, images) -> taps``.

    ``staged`` is :func:`stack_vit_blocks`'s ``[S, L, ...]`` tree (sharded
    ``P('pipe')``); ``rest`` and ``images`` are replicated.
    """
    n_stages = mesh.devices.size

    def fwd(staged, rest, images):
        return pp_vit_apply(vit, staged, rest, images, n_stages, n_micro,
                            tap_blocks)

    sharded = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P("pipe"), P(), P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(sharded)
