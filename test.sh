#!/bin/bash
python -m fusiontransformer_tpu.test --cfg configs/semantic_kitti/middlefusion.yaml "$@"
