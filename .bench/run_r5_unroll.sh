#!/bin/bash
# Round-5 CG static-unroll measurement (VERDICT r4 item 3): the while_loop CG
# computed a dead outer_grad on the final pass (hoisting it into lax.cond was
# 2x slower — bond.py note); the unrolled CG drops it at trace time, saving
# 1 of the 2*npass CG data-pass stages (expected ~12.5% of the CG term).
# Legs: fixed/moving x unroll on/off, 2 measured sweeps each at B=58,862.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo; echo "=== $1 ==="; date -u; }

log "fixed, unroll ON (default)"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'
log "fixed, unroll OFF (while_loop control)"
TNML_CG_UNROLL=0 TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'
log "moving, unroll ON (default)"
TNML_BENCH_LABEL_MODE=moving TNML_BENCH_FIXED=0 TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'
log "moving, unroll OFF (while_loop control)"
TNML_CG_UNROLL=0 TNML_BENCH_LABEL_MODE=moving TNML_BENCH_FIXED=0 TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'
log "done"
