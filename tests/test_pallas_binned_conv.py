"""Fused Pallas binned-slot conv: parity with the XLA binned path.

The kernel runs in interpreter mode on the CPU test mesh (Mosaic lowering
itself is covered on hardware by tools/tpu_smoke.py + the microbench's
numeric checks); these tests pin the MATH — forward and both gradients must
match ``sparse_conv._subm3s`` (which in turn matches the dense path and the
torch reference via tools/check_parity.py) on real hierarchy slot maps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiontransformer_tpu.data.collate import collate_padded
from fusiontransformer_tpu.data.synthetic import SyntheticSCN
from fusiontransformer_tpu.ops import sparse_conv as sc
from fusiontransformer_tpu.ops.hierarchy import build_hierarchy

K = 16


@pytest.fixture(scope="module")
def hier():
    ds = SyntheticSCN(split=("train",), num_scans=2, num_points=3000)
    batch = collate_padded([ds[i] for i in range(2)], 2, 3072, 370, 1226)
    caps = (6144, 4096, 2048, 1024, 512)
    return jax.jit(lambda c, b, v: build_hierarchy(
        c, b, v, caps, tap_slots=(K,) * 5))(
        jnp.asarray(batch["coords"]), jnp.asarray(batch["pt_batch"]),
        jnp.asarray(batch["pt_valid"]))


@pytest.mark.parametrize("level,cin,cout", [(0, 32, 32), (2, 48, 96),
                                            (4, 128, 64)])
def test_fused_matches_xla_binned(hier, level, cin, cout):
    lvl = hier.levels[level]
    cap = lvl.nbr_idx.shape[0]
    rng = np.random.RandomState(level)
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(27, cin, cout) * 0.1).astype(np.float32))
    dout = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
    src, tap = lvl.slot_idx

    def loss_x(f, ww):
        return jnp.vdot(sc._subm3s(f, ww, src, tap, jnp.float32), dout)

    def loss_p(f, ww):
        return jnp.vdot(sc._subm3p(f, ww, src, tap, jnp.float32), dout)

    o_x = sc._subm3s(feats, w, src, tap, jnp.float32)
    o_p = sc._subm3p(feats, w, src, tap, jnp.float32)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=1e-5, atol=1e-5)

    gx = jax.grad(loss_x, argnums=(0, 1))(feats, w)
    gp = jax.grad(loss_p, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-4)


def test_backend_routing(hier):
    """set_slot_backend flips the K-slot path; narrow Cin falls back."""
    lvl = hier.levels[1]
    cap = lvl.nbr_idx.shape[0]
    feats4 = jnp.zeros((cap, 4), jnp.float32)    # stem width: below MIN_CIN
    feats32 = jnp.zeros((cap, 32), jnp.float32)
    w4 = jnp.zeros((27, 4, 8), jnp.float32)
    w32 = jnp.zeros((27, 32, 8), jnp.float32)
    try:
        sc.set_slot_backend("pallas")
        out = sc.subm_conv3(feats32, w32, lvl.nbr_idx,
                            slot_idx=lvl.slot_idx)
        assert out.shape == (cap, 8)
        out4 = sc.subm_conv3(feats4, w4, lvl.nbr_idx, slot_idx=lvl.slot_idx)
        assert out4.shape == (cap, 8)
    finally:
        sc.set_slot_backend("xla")
