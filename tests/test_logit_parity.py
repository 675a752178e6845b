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
