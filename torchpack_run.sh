#!/bin/bash
# Data-parallel training over all visible TPU chips (reference
# torchpack_run.sh used `torchpack dist-run -np 2` + MPI; here one process
# drives the whole mesh — multi-host via JAX_COORDINATOR_ADDRESS).
python -m fusiontransformer_tpu.train --cfg configs/semantic_kitti/lidar.yaml --distributed 1 "$@"
