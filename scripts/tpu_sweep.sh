#!/bin/bash
# One-shot TPU measurement sweep (run from /root/repo, no PYTHONPATH).
# Headline bench runs FIRST so a failure in a long late stage never
# costs the BENCH number; each stage logs to /tmp/sweep_<stage>.log.
set -e
cd "$(dirname "$0")/.."
echo "=== bench (2^18 e2e MSM) ==="
timeout 3600 python bench.py 2>&1 | tee /tmp/sweep_bench.log | grep -Ev "^WARNING"
echo "=== scale e2e 2^16 ==="
timeout 7200 python scripts/scale_e2e_tpu.py 16 2>&1 | tee /tmp/sweep_scale16.log | grep -Ev "^WARNING"
echo "=== zpoly 2^18 (enter-based device check) ==="
timeout 7200 python scripts/zpoly_tpu.py 18 2>&1 | tee /tmp/sweep_zpoly18.log | grep -Ev "^WARNING"
echo "=== scale e2e 2^18 ==="
timeout 10800 python scripts/scale_e2e_tpu.py 18 2>&1 | tee /tmp/sweep_scale18.log | grep -Ev "^WARNING"
echo "=== scale e2e 2^20 (VERDICT item 3 target; runs last) ==="
timeout 14400 python scripts/scale_e2e_tpu.py 20 2>&1 | tee /tmp/sweep_scale20.log | grep -Ev "^WARNING"
echo "SWEEP COMPLETE"
