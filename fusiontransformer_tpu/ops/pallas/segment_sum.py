"""Pallas TPU kernel: sorted-segment weighted sums (scatter-free).

The devoxelize adjoint is the big scatter in the train step:
``dvox[corner_idx[n, e]] += corner_w[n, e] * dout[n]`` — XLA lowers it to a
row scatter running at ~59M rows/s on v5e (measured 41.5 ms/step at batch 8,
the single largest non-gather cost).  This kernel replaces it using a
structural fact of the Morton hierarchy (``ops.hierarchy``): points sorted by
level-0 Morton key are sorted by containing voxel at EVERY level, and every
live voxel contains at least one point — so per level the sorted point
stream's voxel ids are *nondecreasing and gapless*.  A block of ``NB``
consecutive points therefore touches at most ``NB + 1`` *consecutive* output
rows, which makes the reduction a sliding-window accumulation:

  * grid = sequential blocks of the point stream;
  * each block reduces its points into a [window, E*C] tile with ONE one-hot
    MXU matmul (S[r, n] = (ids[n] - window_base == r));
  * a carry accumulator in VMEM scratch slides forward with the window
    (segments spanning blocks keep accumulating; the shift drops only rows
    the stream has passed, which are final);
  * every block DMAs its full window to HBM — overlapping writes are safe
    because the grid is sequential and the *last* writer of a row has, via
    the carry, that row's complete total.

The mirror trick then turns the scatter into gathers (see
``sparse_conv.devoxelize_trilinear``): with per-corner tables
``T[e, m] = sum_{n: vox(n)=m} w[n, e] * g[n]`` the adjoint is
``dvox[u] = sum_e T[e, nbr(u, -e)]`` — 8 plain row gathers through the
ks3 kernel map columns for the ``{0,-1}^3`` offsets.

Replaces the CUDA ``spdevoxelize`` backward of torchsparse (reference
``models/utils.py:81-87``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_RETIRE_CHUNKS = (512, 256, 128, 64, 32, 16, 8)


def _kernel(base_ref, ids_ref, g_ref, w_ref, out_ref, acc_ref, sem_ref,
            *, nb, wr, srows, e_cols, c, mxu_dtype, nblocks):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = pl.multiple_of(base_ref[b], 8)
    prev_base = base_ref[jnp.maximum(b - 1, 0)]
    # Carry: rows the stream has passed are final; live rows shift down by
    # the window advance.  A jump past the whole window (e.g. into the
    # padding tail) must read zeros — rows [wr, srows) are permanently zero
    # and the clamp lands there.
    shift = jnp.minimum(base - prev_base, srows - wr)
    shift = pl.multiple_of(shift, 8)   # bases are sublane-aligned
    carried = acc_ref[pl.ds(shift, wr), :]

    # Retire the rows the window just passed: ids are nondecreasing, so no
    # later block can add to them — acc rows [0, min(shift, wr)) hold final
    # totals for output rows [prev_base, ...).  Writing ONLY these (instead
    # of the whole window every block) cuts output DMA bytes by the
    # points-per-voxel factor (~12x at KITTI occupancy, the kernel's write
    # amplification).  The retire count is 8-aligned and <= wr; decompose it
    # into power-of-two chunks so every DMA slice has a static size.
    retire = jnp.minimum(shift, wr)
    src = jnp.int32(0)
    rem = retire
    for size in _RETIRE_CHUNKS:
        if size > wr:
            continue
        take = rem >= size

        @pl.when(take)
        def _retire(size=size, src=src):
            src8 = pl.multiple_of(src, 8)          # chunks are 8-multiples
            dst8 = pl.multiple_of(prev_base + src, 8)
            dma = pltpu.make_async_copy(
                acc_ref.at[pl.ds(src8, size), :],
                out_ref.at[pl.ds(dst8, size), :],
                sem_ref,
            )
            dma.start()
            dma.wait()

        src = src + jnp.where(take, size, 0)
        rem = rem - jnp.where(take, size, 0)

    # contrib[n, e*C:(e+1)*C] = w[n, e] * g[n, :].  The minor-dim inserts
    # must stay 32-bit (Mosaic limitation); cast the product to mxu_dtype
    # afterwards (bf16 on the production path; f32 when the caller's
    # compute dtype is float32 so parity runs stay truly f32).
    g = g_ref[:].astype(jnp.float32)                        # [nb, c]
    w = w_ref[:].astype(jnp.float32)                        # [nb, e_cols]
    contrib = (w[:, :, None] * g[:, None, :]).reshape(
        nb, e_cols * c).astype(mxu_dtype)

    # One-hot reduce: S[r, n] = (ids[n] - base == r).  Ids far outside the
    # window select no row; ids just past the live range (the sentinel at a
    # mixed tail block) can land in-window, which is why sentinel entries
    # must carry zero weights.
    local = ids_ref[0, :][None, :] - base                    # [1, nb]
    rows = jax.lax.broadcasted_iota(jnp.int32, (wr, nb), 0)
    S = (rows == local).astype(mxu_dtype)
    add = jnp.dot(S, contrib, preferred_element_type=jnp.float32)

    acc_ref[pl.ds(0, wr), :] = carried + add

    # Last block: flush the still-open window (every earlier row has already
    # been retired exactly once above).
    @pl.when(b == nblocks - 1)
    def _flush():
        dma = pltpu.make_async_copy(
            acc_ref.at[pl.ds(0, wr), :],
            out_ref.at[pl.ds(base, wr), :],
            sem_ref,
        )
        dma.start()
        dma.wait()


def sorted_segment_weighted_sum(g, w, ids, num_out, *, block=256,
                                interpret=None, precise=False):
    if block % 8 != 0 or block <= 0:
        # The kernel promises Mosaic 8-aligned retire shifts
        # (pl.multiple_of) and decomposes retire chunks into 8-multiples;
        # a misaligned block would turn that promise into a false compiler
        # hint (silently wrong sums) rather than an error.
        raise ValueError(f"block must be a positive multiple of 8, "
                         f"got {block}")
    if interpret is None:
        # The Mosaic TPU pipeline needs real TPU hardware; tests, the
        # virtual-device dry run, and any non-TPU backend execute via the
        # interpreter (Mosaic fails to lower on GPU too, not just CPU).
        interpret = jax.default_backend() != "tpu"
    return _sorted_segment_weighted_sum(g, w, ids, num_out, block=block,
                                        interpret=interpret, precise=precise)


@functools.partial(jax.jit,
                   static_argnames=("num_out", "block", "interpret", "precise"))
def _sorted_segment_weighted_sum(g, w, ids, num_out, *, block=256,
                                 interpret=False, precise=False):
    """T[u, e*C:(e+1)*C] = sum_{n: ids[n]==u} w[n, e] * g[n, :].

    Args:
      g: [N, C] float values (point stream in SORTED order).
      w: [N, E] float weights (E weight columns, e.g. 8 trilinear corners).
      ids: [N] int32, nondecreasing and gapless on [0, nvalid); padding /
        dropped entries use id >= num_out and MUST carry zero ``w`` rows
        (a sentinel id can land inside the tail block's window).
      num_out: static output row count (level capacity).
      precise: keep per-point contributions in f32 through the one-hot MXU
        matmul (default rounds them to bf16 — the production mixed-precision
        path; pass True when the caller's compute dtype is float32).
    Returns:
      [num_out, E*C] float32.  Rows never reached by the stream (>= nvalid)
      are ZERO (the live-range mask is applied here so the public contract
      is safe for any downstream gather).
    """
    n, c = g.shape
    e_cols = w.shape[1]
    # Mosaic DMA slices need the (minor) column extent 128-aligned; pad the
    # value columns up when E*C is not a multiple of 128.
    if (e_cols * c) % 128:
        cpad = -(-(e_cols * c) // 128) * 128 // e_cols - c
        if (e_cols * (c + cpad)) % 128:
            cpad = -(-c // 128) * 128 - c   # fall back: pad c itself to 128k
        g = jnp.concatenate([g, jnp.zeros((n, cpad), g.dtype)], axis=1)
        out = _sorted_segment_weighted_sum(g, w, ids, num_out, block=block,
                                           interpret=interpret,
                                           precise=precise)
        return out.reshape(num_out, e_cols, c + cpad)[:, :, :c].reshape(
            num_out, e_cols * c)
    if n % block:
        pad = block - n % block
        g = jnp.concatenate([g, jnp.zeros((pad, c), g.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad, e_cols), w.dtype)])
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), num_out, ids.dtype)])
        n += pad
    nblocks = n // block
    # Window: a block's ids span <= block rows (gapless) + alignment slack.
    wr = block + 16
    srows = 2 * wr + 8

    ids = ids.astype(jnp.int32)
    # Per-block window base, aligned down to sublane (8) for DMA efficiency.
    base = (ids[::block] // 8) * 8
    # Mosaic rejects 1-D s32 inputs (XLA T(1024) layout) and (1, block)
    # blocks (sublane divisibility); duplicate each block's ids across 8
    # sublanes so an (8, block) block is legal.  ~5 MB at full batch, noise.
    ids8 = jnp.broadcast_to(ids.reshape(nblocks, 1, block),
                            (nblocks, 8, block)).reshape(nblocks * 8, block)

    out_rows = num_out + wr  # slack so the last windows stay in bounds
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, block), lambda b, base: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda b, base: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, e_cols), lambda b, base: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((srows, e_cols * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # Greedy power-of-two decomposition must cover any 8-aligned retire
    # count up to wr (each chunk used at most once).
    assert wr <= sum(s for s in _RETIRE_CHUNKS if s <= wr) + 7, wr
    out = pl.pallas_call(
        functools.partial(_kernel, nb=block, wr=wr, srows=srows,
                          e_cols=e_cols, c=c,
                          mxu_dtype=jnp.float32 if precise else jnp.bfloat16,
                          nblocks=nblocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, e_cols * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(base, ids8, g, w)
    # Rows the id stream never reaches are uninitialized HBM; ids are gapless
    # so the live range is exactly [0, max live id + 1).  Zero the tail here
    # so the public contract is "unreached rows are 0" (NaN garbage must not
    # leak into any consumer that gathers with an unmasked index).
    nvalid = jnp.max(jnp.where(ids < num_out, ids, -1)) + 1
    live = jnp.arange(num_out, dtype=jnp.int32) < nvalid
    return jnp.where(live[:, None], out[:num_out], 0.0)


def sorted_segment_weighted_sum_ref(g, w, ids, num_out):
    """Pure-XLA oracle (scatter-add) for tests."""
    n, c = g.shape
    e_cols = w.shape[1]
    contrib = (w[:, :, None] * g[:, None, :]).reshape(n, e_cols * c)
    ids = jnp.minimum(ids.astype(jnp.int32), num_out)
    return jax.ops.segment_sum(contrib, ids,
                               num_segments=num_out + 1)[:num_out]
