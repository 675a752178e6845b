#!/bin/bash
# Distributed test path: restore best-IoU checkpoint, dump per-scan
# predictions, evaluate (reference torchpack_test.sh).
python -m fusiontransformer_tpu.train --cfg configs/semantic_kitti/lidar.yaml --use_torchpack_test 1 "$@"
