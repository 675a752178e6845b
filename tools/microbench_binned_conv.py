#!/usr/bin/env python
"""Microbench: fused Pallas binned-slot conv vs the dense 26-tap path.

VERDICT r2 "Next round #2": write the block-diagonal Pallas binning /
gather-GEMM conv kernel ROADMAP sketches and benchmark it against the dense
27-tap XLA path at L0-L4 shapes — or kill the idea with data.

Per level (REAL hierarchy slot maps from synthetic beam scans — Morton
locality is the measured 2x+ factor in gather rate), times three conv
formulations fwd and fwd+bwd at the flagship channel plan:

  dense : tap-major 26-row gather + einsum + center matmul
          (``sparse_conv._subm3``, the production default)
  xlabin: K-slot gather + XLA one-hot rebinning + einsum
          (``sparse_conv._subm3s``, measured-rejected r2)
  fused : K-slot gather + Pallas fused binning+weight kernel
          (``ops.pallas.binned_conv`` — B never leaves VMEM)

MARGINAL cost only: each candidate runs inside a single jitted
``lax.fori_loop`` program with a data dependence between iterations, and the
per-iteration time is the slope between two loop lengths — per ROADMAP
"measured hardware facts", a jitted program costs ~1.5-3 ms launch overhead
through the axon tunnel, which swamps per-call timings at these shapes.

Run on the real chip: python tools/microbench_binned_conv.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy
from fusiontransformer_tpu.ops.pallas.binned_conv import (
    binned_conv_bwd, binned_conv_fwd, pack_slots)

BATCH = 1
POINTS = 18_000
CAPACITY = 20_480
K = 16
N_LO, N_HI = 8, 40


def wall(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def marginal_ms(make_loop):
    """Per-iteration ms: slope between an N_LO- and an N_HI-iteration
    in-program loop (launch overhead + constants cancel)."""
    lo = jax.jit(make_loop(N_LO))
    hi = jax.jit(make_loop(N_HI))
    t_lo = wall(lo)
    t_hi = wall(hi)
    return (t_hi - t_lo) / (N_HI - N_LO) * 1e3


def make_hier():
    from fusiontransformer_tpu.data.collate import collate_padded
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN

    ds = SyntheticSCN(split=("train",), num_scans=BATCH, num_points=POINTS)
    batch = collate_padded([ds[i] for i in range(BATCH)], BATCH, CAPACITY,
                           370, 1226)
    n = BATCH * CAPACITY
    caps = (int(n * 0.85), int(n * 0.67), int(n * 0.67 * 0.67),
            int(n * 0.67 * 0.67 * 0.55), int(n * 0.67 * 0.67 * 0.55 * 0.42))
    caps = tuple(-(-c // 256) * 256 for c in caps)
    hier = jax.jit(lambda c, b, v: build_hierarchy(
        c, b, v, caps, tap_slots=(K,) * 5))(
        jnp.asarray(batch["coords"]), jnp.asarray(batch["pt_batch"]),
        jnp.asarray(batch["pt_valid"]))
    return jax.device_put(hier), caps


# Flagship channel plan per level (the heaviest conv at each level).
LEVEL_CHANNELS = {0: (32, 32), 1: (64, 64), 2: (128, 128), 3: (256, 256),
                  4: (256, 256)}


def run_level(level, lvl, cap, cdt=jnp.bfloat16):
    cin, cout = LEVEL_CHANNELS[level]
    rng = np.random.RandomState(level)
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32))
    nbr = lvl.nbr_idx
    src, tap = lvl.slot_idx
    srcp = jnp.asarray(pack_slots(np.asarray(src)))
    tapp = jnp.asarray(pack_slots(np.asarray(tap)))
    live = float(np.mean(np.asarray(tap) < 27)) * K

    def dense_f(f, ww):
        return sc._subm3(f, ww, nbr, cdt)

    def xlabin_f(f, ww):
        return sc._subm3s(f, ww, src, tap, cdt)

    def fused_f(f, ww):
        g = sc.pad_row(f.astype(cdt))[srcp]            # [V/8, 8K, C]
        return binned_conv_fwd(g, tapp,
                               ww.astype(cdt).reshape(27 * cin, cout))

    dout = jnp.asarray(rng.randn(cap, cout).astype(np.float32))

    def loop_fwd(fn, n):
        def prog(f, ww):
            def body(_, carry):
                return carry + 1e-6 * fn(carry, ww)
            return jax.lax.fori_loop(0, n, body, f)
        return lambda: prog(feats, w)

    def loop_grad(fn, n):
        # Conv is LINEAR in f, so grad wrt f with a constant cotangent is
        # loop-invariant and XLA hoists the whole backward out of the loop.
        # Use vjp with a carry-dependent cotangent (out itself feeds it) and
        # fold dW into the carry so neither pass can be hoisted or DCE'd.
        def prog(f, ww):
            def body(_, carry):
                out, pull = jax.vjp(lambda x, v: fn(x, v), carry, ww)
                df, dw = pull(dout + 1e-6 * out)
                return carry + 1e-6 * df + 1e-12 * dw.sum()
            return jax.lax.fori_loop(0, n, body, f)
        return lambda: prog(feats, w)

    def loop_fused_fb(n):
        def prog(f, ww):
            def body(_, carry):
                wwf = ww.astype(cdt).reshape(27 * cin, cout)
                g = sc.pad_row(carry.astype(cdt))[srcp]
                out = binned_conv_fwd(g, tapp, wwf)
                gd = sc.pad_row((out * 1e-6 + dout).astype(cdt))[srcp]
                dx, dw = binned_conv_bwd(gd, tapp, carry.astype(cdt),
                                         ww.astype(cdt))
                return carry + 1e-6 * dx + 1e-12 * dw.sum()
            return jax.lax.fori_loop(0, n, body, f)
        return lambda: prog(feats, w)

    r = {}
    r["dense_fwd"] = marginal_ms(lambda n: loop_fwd(dense_f, n))
    r["xlabin_fwd"] = marginal_ms(lambda n: loop_fwd(xlabin_f, n))
    r["fused_fwd"] = marginal_ms(lambda n: loop_fwd(fused_f, n))
    r["dense_fb"] = marginal_ms(lambda n: loop_grad(dense_f, n))
    r["xlabin_fb"] = marginal_ms(lambda n: loop_grad(xlabin_f, n))
    r["fused_fb"] = marginal_ms(loop_fused_fb)

    # numeric check vs the XLA binned oracle (bf16 tolerances)
    o_ref = np.asarray(jax.jit(xlabin_f)(feats, w))
    o_fus = np.asarray(jax.jit(fused_f)(feats, w))
    err = np.abs(o_ref - o_fus).max() / max(np.abs(o_ref).max(), 1e-6)

    # backward numeric check: fused kernel grads vs jax.grad of the XLA
    # binned path (same slot maps, same mirror symmetry)
    dxr, dwr = jax.jit(jax.grad(
        lambda f, ww: (xlabin_f(f, ww) * dout).sum(), argnums=(0, 1)))(
        feats, w)

    @jax.jit
    def fused_grads(f, ww):
        gd = sc.pad_row(dout.astype(cdt))[srcp]
        return binned_conv_bwd(gd, tapp, f.astype(cdt), ww.astype(cdt))

    dxf, dwf = fused_grads(feats, w)
    gerr = max(
        np.abs(np.asarray(dxr) - np.asarray(dxf)).max()
        / max(np.abs(np.asarray(dxr)).max(), 1e-6),
        np.abs(np.asarray(dwr) - np.asarray(dwf)).max()
        / max(np.abs(np.asarray(dwr)).max(), 1e-6))
    print(f"L{level} cap={cap:6d} C={cin:3d}->{cout:3d} live={live:4.1f} "
          f"| fwd dense {r['dense_fwd']:6.2f} xlabin {r['xlabin_fwd']:6.2f} "
          f"fused {r['fused_fwd']:6.2f} ms "
          f"| f+b dense {r['dense_fb']:6.2f} xlabin {r['xlabin_fb']:6.2f} "
          f"fused {r['fused_fb']:6.2f} ms | relerr {err:.1e} "
          f"graderr {gerr:.1e}", flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="0,1,2,3,4")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    hier, caps = make_hier()
    for level in (int(x) for x in args.levels.split(",")):
        run_level(level, hier.levels[level], caps[level])


if __name__ == "__main__":
    main()
