"""Voxel-key packing, lexicographic sort, and sorted-table lookup.

TPU-native replacement for torchsparse's GPU hash tables (reference
``models/utils.py:19-27`` uses ``spf.sphash``/``sphashquery``).  On TPU we
avoid hashing entirely: a voxel at integer coords ``(x, y, z)`` in scan ``b``
is identified by a *pair* of int32 keys

    hi = (b << 12) | x          lo = (y << 12) | z

which orders lexicographically as (b, x, y, z).  Coordinates are bounded by
``full_scale`` = 4096 = 2**12 (reference ``config/FusionTransformerConfig.py:81``),
so each field fits in 12 bits and the pair fits native int32 — no int64 (and
thus no x64 mode) is needed anywhere.

* ``sort_by_key`` — stable lexicographic sort via ``lax.sort`` with two keys.
* ``lex_lookup`` — vectorized branchless binary search (lower bound) over the
  sorted table; replaces ``sphashquery``.  O(log V) gathers, fully jittable,
  static shapes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

COORD_BITS = 12
COORD_MASK = (1 << COORD_BITS) - 1

# Sentinel key for padded/invalid slots; sorts after every valid key.
INVALID_KEY = jnp.int32(2**31 - 1)


def pack_keys(batch_idx, coords, valid):
    """Pack (batch, x, y, z) into a lexicographic (hi, lo) int32 key pair.

    Args:
      batch_idx: [N] int32 scan index within the batch.
      coords: [N, 3] int32, each component in [0, 4096).
      valid: [N] bool; invalid rows get INVALID_KEY so they sort last.

    Returns:
      (hi, lo): two [N] int32 arrays.
    """
    hi = (batch_idx << COORD_BITS) | coords[:, 0]
    lo = (coords[:, 1] << COORD_BITS) | coords[:, 2]
    hi = jnp.where(valid, hi, INVALID_KEY)
    lo = jnp.where(valid, lo, INVALID_KEY)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def unpack_keys(hi, lo):
    """Inverse of pack_keys (only meaningful for valid keys)."""
    batch_idx = hi >> COORD_BITS
    x = hi & COORD_MASK
    y = lo >> COORD_BITS
    z = lo & COORD_MASK
    return batch_idx, jnp.stack([x, y, z], axis=-1)


def sort_by_key(hi, lo, *payload):
    """Stable sort of payload arrays by the (hi, lo) key pair."""
    out = jax.lax.sort((hi, lo) + tuple(payload), num_keys=2, is_stable=True)
    return out


def _num_iters(n: int) -> int:
    return max(1, math.ceil(math.log2(max(2, n + 1))))


def lex_lookup(table_hi, table_lo, q_hi, q_lo):
    """Exact-match lookup of query keys in a sorted key table.

    Lower-bound binary search, vectorized over all queries.  The table must be
    sorted by (hi, lo) with INVALID_KEY padding at the end.

    Returns:
      idx: int32 array shaped like q_hi; position of the exact match in the
        table, or ``len(table)`` (sentinel) when the key is absent.
    """
    V = table_hi.shape[0]
    q_shape = q_hi.shape
    q_hi = q_hi.reshape(-1)
    q_lo = q_lo.reshape(-1)

    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, V, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mh = table_hi[mid]
        ml = table_lo[mid]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
        return lo_b, hi_b

    lo_b, hi_b = jax.lax.fori_loop(0, _num_iters(V), body, (lo_b, hi_b))

    pos = jnp.minimum(lo_b, V - 1)
    found = (table_hi[pos] == q_hi) & (table_lo[pos] == q_lo) & (q_hi != INVALID_KEY)
    idx = jnp.where(found, pos, V).astype(jnp.int32)
    return idx.reshape(q_shape)


def sorted_join(table_hi, table_lo, q_hi, q_lo):
    """Exact-match lookup via a single sort-join (TPU-fast path).

    Functionally identical to :func:`lex_lookup`, but instead of a binary
    search (17 serial rounds of 1D gathers — slow on TPU's gather engine) it
    runs ONE ``lax.sort`` over [table ++ queries] with a tie-break key that
    places table rows before equal queries, then propagates the most recent
    table index with a ``cummax`` (monotone because the table is itself
    sorted), verifies key equality with two small-table gathers, and scatters
    results back to query order.  ~10x faster than lex_lookup at rulebook
    sizes (millions of queries against 10^4..10^5-entry tables).
    """
    V = table_hi.shape[0]
    q_shape = q_hi.shape
    q_hi = q_hi.reshape(-1)
    q_lo = q_lo.reshape(-1)
    Q = q_hi.shape[0]

    # Pack (is_query, index) into one int32 operand: table rows carry their
    # index (< 2^30), query rows carry index | QBIT.  Sorting this as the
    # third key both breaks ties table-first and carries the payload — one
    # fewer sort operand.
    QBIT = jnp.int32(1 << 30)
    keys_hi = jnp.concatenate([table_hi, q_hi])
    keys_lo = jnp.concatenate([table_lo, q_lo])
    tag = jnp.concatenate([jnp.arange(V, dtype=jnp.int32),
                           jnp.arange(Q, dtype=jnp.int32) | QBIT])
    s_hi, s_lo, s_tag = jax.lax.sort((keys_hi, keys_lo, tag), num_keys=3)
    s_isq = s_tag >= QBIT
    s_pay = s_tag & (QBIT - 1)

    # Last table index at or before each position; monotone since the table
    # is sorted, so cummax of (table index | -1) is exactly "latest match
    # candidate".
    tbl_here = jnp.where(s_isq, -1, s_pay)
    last_tbl = jax.lax.cummax(tbl_here, axis=0)

    safe = jnp.maximum(last_tbl, 0)
    ok = ((last_tbl >= 0)
          & (table_hi[safe] == s_hi)
          & (table_lo[safe] == s_lo)
          & (s_hi != INVALID_KEY))
    res_sorted = jnp.where(ok, last_tbl, V).astype(jnp.int32)

    scatter_pos = jnp.where(s_isq, s_pay, Q)
    out = (jnp.full((Q,), V, jnp.int32)
           .at[scatter_pos].set(res_sorted, mode="drop"))
    return out.reshape(q_shape)


def unique_sorted(hi, lo):
    """Flag the first occurrence of each distinct key in a sorted key array.

    Returns:
      is_first: [N] bool, True at the first slot of each run of equal keys
        (False for INVALID_KEY padding).
      position: [N] int32, dense rank of the key's unique group (cumsum-based);
        undefined for invalid slots.
      num_unique: scalar int32 count of distinct valid keys.
    """
    valid = hi != INVALID_KEY
    prev_hi = jnp.concatenate([jnp.full((1,), -1, hi.dtype), hi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -1, lo.dtype), lo[:-1]])
    is_new = (hi != prev_hi) | (lo != prev_lo)
    is_first = is_new & valid
    position = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_unique = jnp.sum(is_first.astype(jnp.int32))
    return is_first, position, num_unique
