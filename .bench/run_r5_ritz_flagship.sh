#!/bin/bash
# Round-5 final defaults quality gate: the committed full-set flagship recipe
# with svd_method resolved from the NEW FixedLConfig default (ritz), CG unroll,
# carry-pair defaults, gated monotone, precision=high.  Must reach 100.00%
# held-out like the gram controls (r5_flagship_gated.log, q_fullset_high_r4.log).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
WD=$(mktemp -d /tmp/r5_ritzflag_XXXX); cd "$WD"
sed 's/^precision = highest/\/\/ precision: resolved default (high)/' \
  /root/repo/examples/input_fixedL_fullset_fixed_label > input
grep -n "svd\|precision\|Nsweep" input
date -u
timeout 4200 stdbuf -oL python -u -m tnml_tpu.apps.fixedL input 2>&1 | grep -v '^WARNING'
date -u; echo "workdir: $WD"
