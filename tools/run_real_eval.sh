#!/bin/bash
# Real-data evaluation drill: reference checkpoint -> per-class IoU table.
#
# Chains the exact end-to-end sequence that produces a real SemanticKITTI
# mIoU number the moment a dataset + trained reference checkpoint exist
# (reference eval contract: data/utils/validate.py:13-150 + splits.py:15-24):
#
#   1. offline preprocess (raw velodyne/.label/image_2/calib -> per-frame pkl)
#   2. convert the reference torch .pth -> orbax (tools/convert_checkpoint.py)
#   3. python -m fusiontransformer_tpu.test -> per-class IoU table
#
# Real mode (run on a TPU host with the dataset mounted):
#   bash tools/run_real_eval.sh --root /data/SemanticKitti \
#       --ckpt /path/to/model000095.pth \
#       [--cfg configs/semantic_kitti/middlefusion.yaml] [--split test] \
#       [--out /tmp/real_eval]
#
# Dry-run mode (no dataset, no checkpoint, CPU backend) fabricates a tiny
# raw-KITTI tree (val sequences 07+01) and a random-weight reference
# checkpoint, then exercises every step above unchanged.  Pinned as a
# slow-tier test (tests/test_real_eval_drill.py) so the drill cannot rot.
#   bash tools/run_real_eval.sh --dry-run [--out /tmp/real_eval_dry]
set -euo pipefail
cd "$(dirname "$0")/.."

DRY=0
ROOT=""
CKPT=""
CFG=""
SPLIT=""
WORK=""
while [ $# -gt 0 ]; do
    case "$1" in
        --dry-run) DRY=1; shift ;;
        --root) ROOT="$2"; shift 2 ;;
        --ckpt) CKPT="$2"; shift 2 ;;
        --cfg) CFG="$2"; shift 2 ;;
        --split) SPLIT="$2"; shift 2 ;;
        --out) WORK="$2"; shift 2 ;;
        *) echo "unknown arg: $1" >&2; exit 2 ;;
    esac
done

if [ "$DRY" = 1 ]; then
    CFG="${CFG:-configs/semantic_kitti/lidar.yaml}"
    SPLIT="${SPLIT:-val}"
    WORK="${WORK:-/tmp/real_eval_dry}"
    ROOT="$WORK/raw"
    CKPT="$WORK/reference.pth"
    # Hermetic: CPU backend, tiny capacities sized for the fabricated scans.
    # (FTX_PLATFORM pins the backend through jax.config — the axon TPU
    # platform in this environment overrides a bare JAX_PLATFORMS.)
    export FTX_PLATFORM=cpu JAX_PLATFORMS=cpu
    EXTRA_OPTS=(TPU.POINT_CAPACITY 4096 "TPU.CAPACITY_BUCKETS" "()"
                TEST.BATCH_SIZE 1 DATALOADER.NUM_WORKERS 0)
    rm -rf "$WORK"; mkdir -p "$WORK"
    echo "== [dry] fabricating raw SemanticKITTI val sequences + reference .pth =="
    python tools/_fabricate_real_eval_fixtures.py --out "$WORK" --cfg "$CFG"
else
    CFG="${CFG:-configs/semantic_kitti/middlefusion.yaml}"
    SPLIT="${SPLIT:-test}"
    WORK="${WORK:-/tmp/real_eval}"
    [ -n "$ROOT" ] || { echo "--root required (SemanticKITTI dir with dataset/sequences/)" >&2; exit 2; }
    [ -n "$CKPT" ] || { echo "--ckpt required (trained reference .pth)" >&2; exit 2; }
    EXTRA_OPTS=()
    mkdir -p "$WORK"
fi

PRE="$WORK/preprocessed"
CONV="$WORK/converted_ckpt"
EVAL_DIR="$WORK/eval"
mkdir -p "$EVAL_DIR"

echo "== step 1/3: offline preprocess ($SPLIT split) -> $PRE =="
python -m fusiontransformer_tpu.data.semantic_kitti.preprocess \
    --root "$ROOT" --out "$PRE" --splits "$SPLIT"

echo "== step 2/3: convert reference checkpoint -> $CONV =="
rm -rf "$CONV"
python tools/convert_checkpoint.py --cfg "$CFG" --src "$CKPT" --out "$CONV" \
    "${EXTRA_OPTS[@]}"

echo "== step 3/3: eval ($SPLIT split) -> per-class IoU table =="
python -m fusiontransformer_tpu.test --cfg "$CFG" --ckpt "$CONV/model_converted.ckpt" \
    DATASET.SemanticKITTISCN.preprocess_dir "$PRE" \
    DATASET.SemanticKITTISCN.semantic_kitti_dir "$ROOT" \
    DATASET.TEST "('$SPLIT',)" \
    OUTPUT_DIR "$EVAL_DIR" \
    "${EXTRA_OPTS[@]}" 2>&1 | tee "$WORK/eval_stdout.txt"

echo "== done; eval log under $EVAL_DIR, table in $WORK/eval_stdout.txt =="
