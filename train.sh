#!/bin/bash
# Single-chip training (reference train.sh)
python -m fusiontransformer_tpu.train --cfg configs/semantic_kitti/middlefusion.yaml "$@"
