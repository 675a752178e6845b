"""Shared-weights full-model logit parity (VERDICT r2 #1), as a test.

Runs ``tools/check_parity.py`` in a subprocess (it pins its own CPU backend
and f32 semantics): a synthetic reference-layout checkpoint goes through the
faithful torch re-implementation of the reference graph
(``tools/reference_torch.py``) AND through ``utils/torch_convert`` into the
JAX models, and per-point logits are diffed.  Covers BN eps/placement, tap
permutation (KS3_PERM), devoxelize corner order + renormalization, fusion
injection points, nearest-upsample index math, and head wiring — the
classes of bug the per-piece oracle tests cannot see.

The lidar family alone exercises the whole sparse stack; ``middle`` adds
the ViT/lifting/fusion path.  The full four-family sweep is the committed
``PARITY.md`` (regenerate with ``python tools/check_parity.py``).
"""

import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_full_model_logit_parity_vs_reference():
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "check_parity.py"),
         "--points", "6000", "--families", "lidar,middle",
         "--no-report"],
        capture_output=True, text=True, timeout=1800, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "FAIL" not in proc.stderr


def _run_parity(*extra):
    return subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "check_parity.py"),
         "--points", "3000", "--families", "lidar", "--no-report", *extra],
        capture_output=True, text=True, timeout=1800, cwd=REPO)


@pytest.mark.slow
def test_parity_train_mode_bn():
    """Train-mode BN (normalize by batch statistics) parity on the lidar
    family — the statistics the reference actually trains under (r3 ask)."""
    proc = _run_parity("--train-bn")
    assert proc.returncode == 0, proc.stderr[-4000:]


@pytest.mark.slow
@pytest.mark.parametrize("flip", ["--flip-tap", "--flip-ti"])
def test_parity_sensitive_to_torchsparse_conventions(flip):
    """The harness assumes two torchsparse v1.1.0 conventions
    (TAP_X_FASTEST tap enumeration, TI_RENORM devoxelize renormalization;
    source unavailable here — zero egress).  Both sides of the oracle share
    those tables, so a wrong shared guess would pass silently UNLESS the
    harness is sensitive to them: flipping either convention on the torch
    side only must make parity FAIL (observed max_abs ~5e-2 vs the ~2e-7
    pass level — a 5-orders-of-magnitude signal)."""
    proc = _run_parity(flip)
    assert proc.returncode != 0, (
        f"parity PASSED with {flip} — harness is blind to this convention\n"
        + proc.stderr[-2000:])
    assert "FAIL" in proc.stderr
