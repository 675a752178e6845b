#!/usr/bin/env python
"""Attention formulation sweep at DeiT shapes across batch sizes.

Round-1 measured the Pallas TPU flash kernel SLOWER than the materialized
einsum+f32-softmax at b<=2 (ROADMAP "Attention variants"); this sweeps the
big-batch regime (the 2D-only bench runs b8, where the [b*h, n, n] f32
softmax tensor costs ~5 ms/step of the 15 ms device step).

Usage: python tools/microbench_attention.py [batches...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, N, D = 12, 578, 64
DEPTH = 12     # time all 12 blocks' attention back to back, like the model


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    batches = [int(b) for b in sys.argv[1:]] or [1, 2, 8]

    def einsum_attn(q, k, v):
        scale = D ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(q.dtype), v)

    def flash_attn(q, k, v):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        return flash_attention(q, k, v, sm_scale=D ** -0.5)

    def dpa(q, k, v):
        # jax.nn API wants [b, n, h, d]
        qt, kt, vt = (x.swapaxes(1, 2) for x in (q, k, v))
        out = jax.nn.dot_product_attention(qt, kt, vt, scale=D ** -0.5)
        return out.swapaxes(1, 2)

    variants = {"einsum_f32sm": einsum_attn, "flash_pallas": flash_attn,
                "dot_product_attention": dpa}

    for b in batches:
        key = jax.random.PRNGKey(0)
        qkv = [jax.random.normal(jax.random.PRNGKey(i), (b, H, N, D),
                                 jnp.bfloat16) for i in range(3)]
        for name, fn in variants.items():
            def run(q, k, v, fn=fn):
                x = (q, k, v)
                for _ in range(DEPTH):
                    o = fn(*x)
                    x = (o, k, v)
                return o

            try:
                jfn = jax.jit(run)
                o = jfn(*qkv)
                np.asarray(o[:1, :1, :1, :1])  # sync (1-element readback)
                times = []
                for _ in range(10):
                    t0 = time.perf_counter()
                    o = jfn(*qkv)
                    np.asarray(o[:1, :1, :1, :1])
                    times.append(time.perf_counter() - t0)
                ms = np.median(times) * 1e3
                per_block_us = ms / DEPTH * 1e3
                print(f"b={b:2d} {name:24s} {ms:8.2f} ms/12blk "
                      f"({per_block_us:7.1f} us/block)")
            except Exception as e:  # noqa: BLE001
                print(f"b={b:2d} {name:24s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
