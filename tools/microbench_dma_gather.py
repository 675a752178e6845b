#!/usr/bin/env python
"""Microbench: can a Pallas kernel gather rows from HBM faster than XLA?

VERDICT r3 "Next round #8": the grouped gather feeding the fused binned
conv is an XLA HBM pass at the gather-engine row-rate limit (~540 M rows/s,
ROADMAP "the gather wall").  Prototype moving the gather INTO the Pallas
kernel (scalar-prefetch indices + dynamic loads so rows stream HBM->VMEM
once) — or kill it with numbers showing Mosaic's mechanisms can't beat the
gather engine.

Four row-gather formulations, timed by the in-program fori_loop slope
(per-call launch overhead through the axon tunnel swamps single-call
timings).  R rows per iteration are gathered from a [cap, C] bf16 table
using REAL flagship slot-map indices (Morton locality included — it is the
measured 2x+ factor in gather rate):

  xla        pad_row(feats)[idx]            — the gather engine (baseline)
  mosaic_bs  pallas grid over row GROUPS; BlockSpec index_map reads a
             group id from a scalar-prefetch SMEM array, so Mosaic's
             pipeline DMAs each (8, C) block HBM->VMEM (the
             "scalar-prefetch + dynamic loads" sketch, expressed the
             idiomatic Pallas way).  Mosaic rejects sub-8-row blocks, so
             this variant gathers 8-row-ALIGNED groups — an upper bound
             for the mechanism (8x fewer descriptors than the per-row
             gather it would have to replace)
  dma_chain  hand-rolled per-row pltpu.make_async_copy chain from an HBM
             ref, NBUF=8 outstanding copies double-buffered
  vmem_dyn   whole table resident in VMEM (flagship tables are <= 2.3 MB),
             per-row dynamic-slice reads — no HBM traffic at all, measures
             Mosaic's dynamic VMEM addressing rate

Run on the real chip: python tools/microbench_dma_gather.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHUNK = 16384         # rows gathered per pallas_call / per loop iteration
NBUF = 8              # outstanding DMAs in the hand-rolled chain
N_LO, N_HI = 8, 64


def wall(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def marginal_ms(make_loop):
    lo = jax.jit(make_loop(N_LO))
    hi = jax.jit(make_loop(N_HI))
    t_lo = wall(lo)
    t_hi = wall(hi)
    return (t_hi - t_lo) / (N_HI - N_LO) * 1e3


# --------------------------------------------------------------------------- #
# mosaic_bs: grid over rows, scalar-prefetch index_map drives the block DMA
# --------------------------------------------------------------------------- #

def _copy_kernel(idx_ref, in_ref, out_ref):
    out_ref[:] = in_ref[:]


def mosaic_bs_gather(feats, idx):
    # idx entries are row ids; each grid step copies the 8-row-aligned
    # GROUP containing that row (8 rows per descriptor — the best case
    # Mosaic's block pipeline can offer, since sub-8-row blocks are
    # rejected by the lowering).  CHUNK rows -> CHUNK/8 grid steps so the
    # descriptor count matches what an 8-rows-per-descriptor production
    # gather would issue for the same row count.
    c = feats.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(CHUNK // 8,),
        in_specs=[pl.BlockSpec(
            (8, c), lambda i, idx_ref: (idx_ref[i] // 8, 0))],
        out_specs=pl.BlockSpec((8, c), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CHUNK, c), feats.dtype),
    )(idx, feats)


# --------------------------------------------------------------------------- #
# dma_chain: hand-rolled async row copies from an HBM ref
# --------------------------------------------------------------------------- #

def _dma_chain_kernel(idx_ref, feats_ref, out_ref, *, c):
    # feats_ref is [rows, 1, C]: one row per (8, 128) tile, because a DMA
    # slice of a tiled HBM dim must be 8-sublane aligned — per-row HBM DMA
    # is not expressible at the natural [rows, C] layout AT ALL (Mosaic:
    # "Slice shape along dimension 0 must be aligned to tiling (8)").
    # The row-per-tile layout burns 8x HBM bytes; this variant measures
    # the per-descriptor rate ceiling, not a deployable layout.
    def body(scratch, sem):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                feats_ref.at[idx_ref[i]],
                scratch.at[slot],
                sem.at[slot],
            )

        for s in range(NBUF):
            get_dma(s, s).start()

        def loop(i, acc):
            slot = jax.lax.rem(i, NBUF)
            get_dma(slot, i).wait()
            acc = acc + scratch[slot].astype(jnp.float32)

            @pl.when(i + NBUF < CHUNK)
            def _():
                get_dma(slot, i + NBUF).start()

            return acc

        acc = jax.lax.fori_loop(0, CHUNK, loop,
                                jnp.zeros((1, c), jnp.float32))
        out_ref[:] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF, 1, c), feats_ref.dtype),
        sem=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def dma_chain_gather(feats, idx):
    # f32 table padded to 128 lanes: bf16's 2-sublane packing and sub-128
    # lane extents both forbid single-row DMA slices (this variant measures
    # descriptor rate, so wider rows only flatter it).
    c = feats.shape[1]
    feats = feats.astype(jnp.float32)[:, None, :]
    if c < 128:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, 128 - c)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_dma_chain_kernel, c=feats.shape[2]),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, feats.shape[2]), jnp.float32),
    )(idx, feats)[:, :c]


# --------------------------------------------------------------------------- #
# vmem_dyn: whole table in VMEM, per-row dynamic-slice reads
# --------------------------------------------------------------------------- #

def _vmem_dyn_kernel(idx_ref, feats_ref, out_ref, *, c):
    # feats_ref is [rows, 1, C]: the dynamic row index lands on a leading
    # (untiled) dim, which Mosaic's dynamic addressing accepts.
    def loop(i, acc):
        return acc + feats_ref[idx_ref[i]].astype(jnp.float32)

    out_ref[:] = jax.lax.fori_loop(0, CHUNK, loop,
                                   jnp.zeros((1, c), jnp.float32))


def vmem_dyn_gather(feats, idx):
    c = feats.shape[1]
    feats = feats[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_vmem_dyn_kernel, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.float32),
    )(idx, feats)


# --------------------------------------------------------------------------- #

def run_level(level, cap, c, src_flat):
    rng = np.random.RandomState(level)
    feats = jnp.asarray(rng.randn(cap + 1, c).astype(np.float32),
                        dtype=jnp.bfloat16)
    # Real slot-map row ids (sentinel cap -> the pad row, like production).
    n_chunks = len(src_flat) // CHUNK
    idx = jnp.asarray(src_flat[:n_chunks * CHUNK].reshape(n_chunks, CHUNK)
                      .astype(np.int32))

    def xla_loop(n):
        def prog():
            def body(i, acc):
                rows = feats[idx[jax.lax.rem(i, n_chunks)]]
                return acc + jnp.sum(rows.astype(jnp.float32), axis=0,
                                     keepdims=True)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((1, c), jnp.float32))
        return prog

    def pallas_loop(fn, n):
        def prog():
            def body(i, acc):
                out = fn(feats, idx[jax.lax.rem(i, n_chunks)])
                if out.shape[0] == CHUNK:
                    out = jnp.sum(out.astype(jnp.float32), axis=0,
                                  keepdims=True)
                return acc + out
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((1, c), jnp.float32))
        return prog

    rows_per_iter = CHUNK

    def rate(ms):
        return rows_per_iter / (ms * 1e-3) / 1e6 if ms > 1e-6 else float("inf")

    r_xla = marginal_ms(xla_loop)
    r_bs = marginal_ms(lambda n: pallas_loop(mosaic_bs_gather, n))
    r_dma = marginal_ms(lambda n: pallas_loop(dma_chain_gather, n))
    r_vm = marginal_ms(lambda n: pallas_loop(vmem_dyn_gather, n))

    # correctness spot check (sum of gathered rows matches XLA; mosaic_bs
    # gathers 8-row-ALIGNED groups by construction, so it is rate-only)
    ref = np.asarray(jax.jit(xla_loop(1))())
    got_dma = np.asarray(jax.jit(pallas_loop(dma_chain_gather, 1))())
    got_vm = np.asarray(jax.jit(pallas_loop(vmem_dyn_gather, 1))())
    scale = max(np.abs(ref).max(), 1e-6)
    errs = [np.abs(ref - g).max() / scale for g in (got_dma, got_vm)]

    print(f"L{level} cap={cap:6d} C={c:3d} ({c*2:3d} B rows) "
          f"| xla {r_xla:7.3f} ms = {rate(r_xla):6.1f} M rows/s "
          f"| mosaic_bs {r_bs:7.3f} ms = {rate(r_bs):6.1f} "
          f"| dma_chain {r_dma:7.3f} ms = {rate(r_dma):6.1f} "
          f"| vmem_dyn {r_vm:7.3f} ms = {rate(r_vm):6.1f} "
          f"| err {max(errs):.1e}", flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
    from fusiontransformer_tpu.data.collate import collate_padded
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN

    ds = SyntheticSCN(split=("train",), num_scans=1, num_points=18_000)
    batch = collate_padded([ds[0]], 1, 20_480, 370, 1226)
    caps = (17408, 11648, 7808, 4352, 1792)
    hier = jax.jit(lambda c, b, v: build_hierarchy(
        c, b, v, caps, tap_slots=(16,) * 5))(
        jnp.asarray(batch["coords"]), jnp.asarray(batch["pt_batch"]),
        jnp.asarray(batch["pt_valid"]))

    for level, c in ((0, 32), (2, 128)):
        src, _ = hier.levels[level].slot_idx
        run_level(level, caps[level], c, np.asarray(src).reshape(-1))


if __name__ == "__main__":
    main()
