#!/bin/bash
# Test gate (the reference's test.sh is an empty stub — see SURVEY §2.1).
#
#   bash test.sh          quick tier: every test not marked @pytest.mark.slow
#   bash test.sh --slow   full suite (slow e2e/multi-process tests included)
#
# The eval CLI (reference test.py analog) is:
#   python -m fusiontransformer_tpu.test --cfg configs/semantic_kitti/middlefusion.yaml
set -e
cd "$(dirname "$0")"
if [ "$1" = "--slow" ]; then
    shift
    exec python -m pytest tests/ -q "$@"
fi
exec python -m pytest tests/ -q -m "not slow" "$@"
