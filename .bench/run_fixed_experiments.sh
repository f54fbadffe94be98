#!/bin/bash
# Fixed-layout blocked-engine experiment chain (run when the TPU is free).
# Generous inner timeouts — do NOT SIGTERM these mid-run (a killed axon job
# can wedge the pool claim for hours).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== extend_micro (roofline data) ==="
timeout 2000 python .bench/extend_micro.py 2>&1 | grep -v WARNING

echo "=== fixed bench: bf16 rebuild carry ==="
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 TNML_REBUILD_CARRY=bf16 \
  timeout 2000 python bench.py 2>&1 | tail -5

echo "=== fixed bench: bf16 carry + no-norm rebuilds ==="
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 TNML_REBUILD_CARRY=bf16 \
  TNML_REBUILD_NONORM=1 timeout 2000 python bench.py 2>&1 | tail -5
