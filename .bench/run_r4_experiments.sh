#!/bin/bash
# Round-4 experiment chain (VERDICT r3 items 1+2): re-measure both headline
# modes under the current tree, then measure the queued blocked-engine levers.
# Sequential — exactly one TPU-holding process at a time.  Do NOT SIGTERM a
# leg mid-run (a killed axon job can wedge the pool claim for hours); every
# leg is bounded by bench.py's own watchdog + a generous outer timeout.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo; echo "=== $1 ==="; date -u; }

log "moving headline (confirm r3's 8.6 s/sweep under current tree)"
TNML_BENCH_LABEL_MODE=moving TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "fixed baseline (blocked engine, no knobs)"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "fixed + TNML_REBUILD_CARRY=bf16"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 TNML_REBUILD_CARRY=bf16 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "fixed + bf16 carry + TNML_REBUILD_NONORM=1"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 TNML_REBUILD_CARRY=bf16 \
  TNML_REBUILD_NONORM=1 timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "fixed + ritz split (TNML_BENCH_SVD=ritz)"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 TNML_BENCH_SVD=ritz \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "done"
