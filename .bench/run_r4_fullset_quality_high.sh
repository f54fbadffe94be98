#!/bin/bash
# Gate for flipping the flagship recipe to precision=high: run the committed
# full-set fixed-label example VERBATIM except precision=high, record
# per-sweep held-out accuracy.  (highest-path evidence:
# quality_fullset_fixed_r4.log — 100.00% from sweep 3.)
set -x
WD=$(mktemp -d /tmp/fullset_r4h_XXXX)
cd "$WD"
sed 's/^precision = highest/precision = high/' \
  /root/repo/examples/input_fixedL_fullset_fixed_label > input
grep -n "precision" input
export PYTHONPATH=/root/repo:/root/.axon_site
date -u
timeout 5400 python -m tnml_tpu.apps.fixedL input 2>&1 | grep -v '^WARNING'
date -u
echo "workdir: $WD"
