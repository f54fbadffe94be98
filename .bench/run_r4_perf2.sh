#!/bin/bash
# Round-4 second TPU chain: measure the env_extend epilogue rewrite on both
# headline modes, the true-default-precision quality question (after the
# configure_matmul_precision 'default' fix), and the full-set fixed-label
# quality run (verdict r3 item 3).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo; echo "=== $1 ==="; date -u; }

log "fixed anchor, TRUE precision=default (config fix), split fix"
A="740 12 4 3e-2 40,60,80,100,120 1e-10 1.0"
timeout 2400 python .bench/quality_exp.py fixh_def2_r4 $A default fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_fixn_def2_r4.log

log "fixed bench, epilogue extends, prec=highest"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "fixed bench, epilogue extends, prec=high"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 TNML_BENCH_PRECISION=high \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "moving bench, epilogue extends (regression check)"
TNML_BENCH_LABEL_MODE=moving TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "done"
