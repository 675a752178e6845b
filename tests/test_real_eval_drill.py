"""The real-data readiness drill must keep working (tools/run_real_eval.sh).

Runs the dry-run mode in a subprocess: fabricate a raw SemanticKITTI val
tree + a reference-format .pth, offline-preprocess it, convert the
checkpoint, and drive ``fusiontransformer_tpu.test`` to a per-class IoU
table — the exact command sequence that will produce a real mIoU number
the day a dataset and a trained reference checkpoint are available
(reference eval contract ``data/utils/validate.py:13-150``).
"""

import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_run_real_eval_dry_run(tmp_path):
    work = str(tmp_path / "real_eval_dry")
    proc = subprocess.run(
        ["bash", osp.join(REPO, "tools", "run_real_eval.sh"),
         "--dry-run", "--out", work],
        capture_output=True, text=True, timeout=900)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]

    # Every stage left its artifact.
    assert osp.exists(osp.join(work, "reference.pth"))
    assert osp.exists(osp.join(work, "preprocessed", "07", "0.pkl"))
    assert osp.exists(osp.join(work, "preprocessed", "01", "0.pkl"))
    assert osp.exists(osp.join(work, "converted_ckpt", "model_converted.ckpt"))

    # The eval printed the reference-parity per-class table on the val split.
    table = open(osp.join(work, "eval_stdout.txt")).read()
    assert "3D class-wise segmentation accuracy and IoU" in table
    assert "traffic-sign" in table and "unlabeled" in table
    assert "3D overall IOU" in table
    # Conversion was complete (no randomly-initialized leftovers).
    assert "merged 161/161 param leaves" in out
    assert "WARNING: some target params were not covered" not in out
