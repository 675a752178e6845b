#!/bin/bash
# The two learning-signature converge recipes (training-works evidence).
#
# No real dataset exists on this machine, so the strongest available
# training evidence is convergence on the held-out-validated synthetic
# world (data/synthetic.py): geometry-determined classes (ground plane ->
# class 9, facades -> class 13, boxes -> class 1) must be learned; the
# cyclic noise label slots are unlearnable by construction and must stay
# at the chance floor.  Two recipes, 60 epochs x 128 scans each:
#
#   converge_demo  3D-only (LidarSeg):          the sparse-conv stack +
#                  trainer + eval pipeline learn end to end
#   converge_2d    2D+3D (MiddleFusionTransformer): the full flagship —
#                  dual heads, KL coupling, fusion injection; the 2D+3D
#                  ensemble must beat both single streams
#
# Evidence (final per-class IoU tables + metrics.jsonl + the exact command
# lines) is copied to the TRACKED results/ directory; checkpoints and TB
# events stay untracked under logs/.  BASELINE.md cites results/ paths.
#
#   bash tools/run_converge.sh            # both runs, ~1-2 h on one v5e
#   bash tools/run_converge.sh demo|2d    # one recipe
set -euo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${CONVERGE_EPOCHS:-60}"
SCANS="${CONVERGE_SCANS:-128}"
WHICH="${1:-both}"

run_one() {
    local name="$1"; shift
    local logdir="logs/semantic_kitti/synthetic/$name"
    rm -rf "$logdir"
    echo "== $name: $EPOCHS epochs x $SCANS scans =="
    python -m fusiontransformer_tpu.train \
        --cfg configs/semantic_kitti/synthetic.yaml --run_name "$name" \
        DATASET.SyntheticSCN.num_scans "$SCANS" \
        SCHEDULER.MAX_EPOCH "$EPOCHS" \
        "$@" 2>&1 | tee "/tmp/$name.stdout"

    local out="results/$name"
    mkdir -p "$out"
    cp "$logdir"/metrics.jsonl "$out/metrics.jsonl"
    cp "$logdir"/log.*.txt "$out/train_log.txt"
    { echo "# $name — $EPOCHS epochs x $SCANS synthetic scans"
      echo "# command: tools/run_converge.sh $WHICH (CONVERGE_EPOCHS=$EPOCHS CONVERGE_SCANS=$SCANS)"
      echo "# commit: $(git rev-parse HEAD)"
      echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
    } > "$out/RUN.txt"
}

if [ "$WHICH" = "both" ] || [ "$WHICH" = "demo" ]; then
    run_one converge_demo \
        MODEL.TYPE LidarSeg MODEL.USE_FUSION False MODEL.USE_IMAGE False \
        MODEL.DUAL_HEAD False
fi
if [ "$WHICH" = "both" ] || [ "$WHICH" = "2d" ]; then
    run_one converge_2d
fi
echo "== evidence under results/ — commit it =="
