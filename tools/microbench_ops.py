#!/usr/bin/env python
"""Per-op microbenchmark on the real TPU.

Measures the primitives that dominate the SPVCNN step (see ROADMAP.md):
row-gather throughput, per-level subm_conv3 cost, and the building blocks of
the proposed brick (2x2x2 Morton-tile) conv, so layout decisions are made
from measured numbers rather than the 50M-rows/s folklore.

Run:  python tools/microbench_ops.py [--levels 0,1,2,3,4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fusiontransformer_tpu.ops import sparse_conv as sc  # noqa: E402
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy  # noqa: E402


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_batch(batch=4, points_per_scan=24576, seed=0):
    from fusiontransformer_tpu.data.collate import collate_padded
    from fusiontransformer_tpu.data.synthetic import SyntheticSCN
    ds = SyntheticSCN(num_scans=batch, num_points=120_000, seed=seed)
    samples = [ds[i] for i in range(batch)]
    return collate_padded(samples, batch, points_per_scan, 370, 1226,
                          output_image=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # ---- realistic hierarchy (flagship shapes) ---------------------------
    batch = make_batch(args.batch)
    caps = [args.batch * 24576]
    for frac in (0.8, 0.7, 0.6, 0.5):
        caps.append(max(128, int(round(caps[-1] * frac / 128.0)) * 128))
    caps = tuple(caps)
    print(f"caps: {caps}  valid pts: {batch['pt_valid'].sum()}", flush=True)

    hb = jax.jit(lambda c, b, v: build_hierarchy(c, b, v, caps))
    hier = hb(jnp.asarray(batch["coords"]), jnp.asarray(batch["pt_batch"]),
              jnp.asarray(batch["pt_valid"]))
    hier = jax.block_until_ready(hier)
    for l, lvl in enumerate(hier.levels):
        print(f"  L{l}: cap={lvl.valid.shape[0]} nvalid={int(lvl.nvalid)} "
              f"raw={int(lvl.nvalid_raw)}", flush=True)
    t = timeit(hb, jnp.asarray(batch["coords"]),
               jnp.asarray(batch["pt_batch"]),
               jnp.asarray(batch["pt_valid"]), iters=5)
    print(f"build_hierarchy: {t*1e3:8.2f} ms", flush=True)

    key = jax.random.PRNGKey(0)

    # ---- raw gather throughput -------------------------------------------
    print("\n-- raw row gather: out[i] = table[idx[i]] --", flush=True)
    for V, Q, C in [(98304, 98304 * 27, 32), (98304, 98304 * 27, 8),
                    (98304, 98304, 32), (16512, 16512 * 27, 256),
                    (16512, 16512 * 27, 2048),
                    (12288, 12288 * 27, 256), (98304, 98304 * 8, 256),
                    (98304, 98304 * 2, 256)]:
        table = jax.random.normal(key, (V, C), jnp.bfloat16)
        idx = jax.random.randint(key, (Q,), 0, V, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt = timeit(f, table, idx, iters=args.iters)
        rows = Q / dt / 1e6
        gb = Q * C * 2 / dt / 1e9
        print(f"  V={V:7d} Q={Q:8d} C={C:4d}: {dt*1e3:8.3f} ms  "
              f"{rows:7.1f} Mrows/s  {gb:7.1f} GB/s", flush=True)

    # ---- per-level subm_conv3 (current path) ------------------------------
    # (level, Cin, Cout) pairs that appear in SPVCNN (encoder + decoder).
    sites = [(0, 32, 32), (1, 32, 32), (2, 64, 64), (3, 128, 128),
             (4, 256, 256), (3, 256, 256), (2, 128, 128), (1, 96, 96),
             (0, 96, 96)]
    print("\n-- subm_conv3 (27-tap gather + GEMM), fwd --", flush=True)
    for (l, cin, cout) in sites:
        V = caps[l]
        feats = jax.random.normal(key, (V, cin), jnp.float32)
        w = jax.random.normal(key, (27, cin, cout), jnp.float32) * 0.01
        nbr = hier.levels[l].nbr_idx
        f = jax.jit(lambda x, w: sc.subm_conv3(x, w, nbr))
        dt = timeit(f, feats, w, iters=args.iters)
        rows = V * 27 / dt / 1e6
        print(f"  L{l} V={V:6d} C={cin:3d}->{cout:3d}: {dt*1e3:8.3f} ms "
              f"({rows:6.1f} Mrows/s equiv)", flush=True)

    # fwd+bwd at two sites
    print("\n-- subm_conv3 fwd+bwd --", flush=True)
    for (l, cin, cout) in [(0, 32, 32), (3, 256, 256)]:
        V = caps[l]
        feats = jax.random.normal(key, (V, cin), jnp.float32)
        w = jax.random.normal(key, (27, cin, cout), jnp.float32) * 0.01
        nbr = hier.levels[l].nbr_idx
        f = jax.jit(jax.grad(
            lambda x, w: jnp.sum(sc.subm_conv3(x, w, nbr) ** 2), argnums=(0, 1)))
        dt = timeit(f, feats, w, iters=args.iters)
        print(f"  L{l} V={V:6d} C={cin:3d}->{cout:3d}: {dt*1e3:8.3f} ms",
              flush=True)

    # ---- down/up conv (current) -------------------------------------------
    print("\n-- down_conv2 / up_conv2 (current) --", flush=True)
    for l, cin, cout in [(0, 32, 32), (3, 256, 256)]:
        Vf, Vc = caps[l], caps[l + 1]
        feats = jax.random.normal(key, (Vf, cin), jnp.float32)
        w = jax.random.normal(key, (8, cin, cout), jnp.float32) * 0.01
        ci = hier.levels[l + 1].child_idx
        pi = hier.levels[l].parent_idx
        ki = hier.levels[l].child_kidx
        f = jax.jit(lambda x, w: sc.down_conv2(x, w, ci))
        dt = timeit(f, feats, w, iters=args.iters)
        print(f"  down L{l}->L{l+1} C={cin}->{cout}: {dt*1e3:8.3f} ms", flush=True)
        featsc = jax.random.normal(key, (Vc, cin), jnp.float32)
        f = jax.jit(lambda x, w: sc.up_conv2(x, w, pi, ki))
        dt = timeit(f, featsc, w, iters=args.iters)
        print(f"  up   L{l+1}->L{l} C={cin}->{cout}: {dt*1e3:8.3f} ms", flush=True)

    # ---- brick building blocks ---------------------------------------------
    # Brick table of level l = voxel table of level l+1 (Morton key >> 3).
    print("\n-- brick-conv building blocks (prototype shapes) --", flush=True)
    for (l, C) in [(0, 32), (0, 96), (1, 96), (2, 128), (3, 256)]:
        Vv, Bc = caps[l], caps[l + 1]
        # enter: scatter compact -> brick slots == one gather of 8*Bc rows
        table = jax.random.normal(key, (Vv + 1, C), jnp.bfloat16)
        enter_idx = jax.random.randint(key, (Bc * 8,), 0, Vv, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt_enter = timeit(f, table, enter_idx, iters=args.iters)
        # neighborhood: gather 27 brick rows (8C wide) per brick
        btab = jax.random.normal(key, (Bc + 1, 8 * C), jnp.bfloat16)
        nidx = jax.random.randint(key, (Bc, 27), 0, Bc, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt_nbr = timeit(f, btab, nidx, iters=args.iters)
        # micro-conv: [B,4,4,4,C] -> 3x3x3 VALID -> [B,2,2,2,C']
        reg = jax.random.normal(key, (Bc, 4, 4, 4, C), jnp.bfloat16)
        kern = jax.random.normal(key, (3, 3, 3, C, C), jnp.bfloat16) * 0.01

        def micro(reg, kern):
            return jax.lax.conv_general_dilated(
                reg, kern, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
        f = jax.jit(micro)
        dt_conv = timeit(f, reg, kern, iters=args.iters)
        # exit: gather Vv rows from [Bc*8, C]
        otab = jax.random.normal(key, (Bc * 8 + 1, C), jnp.bfloat16)
        oidx = jax.random.randint(key, (Vv,), 0, Bc * 8, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt_exit = timeit(f, otab, oidx, iters=args.iters)
        # reference single conv cost for comparison
        print(f"  L{l} C={C:3d} B={Bc:6d}: enter {dt_enter*1e3:7.3f}  "
              f"nbr27 {dt_nbr*1e3:7.3f}  microconv {dt_conv*1e3:7.3f}  "
              f"exit {dt_exit*1e3:7.3f} ms", flush=True)

    # ---- point<->voxel transfers -------------------------------------------
    print("\n-- voxelize / devoxelize --", flush=True)
    N = caps[0]
    for l in (2, 4):
        C = {2: 128, 4: 256}[l]
        V = caps[l]
        ptf = jax.random.normal(key, (N, C), jnp.float32)
        pv = hier.pt_voxel_idx[l]
        pvld = hier.pt_valid
        f = jax.jit(lambda x: sc.voxelize_mean(x, pv, pvld, V))
        dt = timeit(f, ptf, iters=args.iters)
        print(f"  voxelize_mean   L{l} C={C}: {dt*1e3:8.3f} ms", flush=True)
        vf = jax.random.normal(key, (V, C), jnp.float32)
        ci, cw = hier.pt_corner_idx[l], hier.pt_corner_w[l]
        f = jax.jit(lambda x: sc.devoxelize_trilinear(x, ci, cw))
        dt = timeit(f, vf, iters=args.iters)
        print(f"  devoxelize_tri  L{l} C={C}: {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
