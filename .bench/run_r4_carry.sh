#!/bin/bash
# Round-4 third TPU chain: re-measure the blocked-engine rebuild knobs AFTER
# the env_extend epilogue rewrite (the r3-era measurements predate it and were
# duds because the einsum intermediate dominated; now that extends are ~2.9 s
# of a 16.9 s sweep the carry dtype could matter at the margin).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo; echo "=== $1 ==="; date -u; }

log "fixed bench, carry=f32 (default), prec=highest  [control]"
TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "fixed bench, carry=bf16, prec=highest"
TNML_REBUILD_CARRY=bf16 TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "fixed bench, carry=bf16 + nonorm, prec=highest"
TNML_REBUILD_CARRY=bf16 TNML_REBUILD_NONORM=1 TNML_BENCH_LABEL_MODE=fixed TNML_BENCH_SWEEPS=2 \
  timeout 2400 python bench.py 2>&1 | grep -v '^WARNING'

log "done"
