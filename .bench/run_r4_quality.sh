#!/bin/bash
# Round-4 quality chain: validate the pseudo-isometry split fix on the fixed-
# label anchor config (740/label, normal map rescale 0.1, monotone, ramp to
# m=120) at all three precisions.  Compare against the r3 logs:
#   quality_fixed_norm.log    (highest, pre-fix): 99.99% best, rej 1-3/sweep,
#                             maxjump up to 3.25e+01
#   quality_fixn_high_r3.log  (high, pre-fix): collapse to 23%, rej 48/sweep,
#                             maxjump 2.8e+03
# Expectation with the fix: maxjump ~1e-3-scale, rej ~0, no collapse at high.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== extend micro (epilogue-fusion variants) ==="
timeout 2000 python .bench/extend_micro.py 2>&1 | grep -v '^WARNING'

A="740 12 4 3e-2 40,60,80,100,120 1e-10 1.0"
echo "=== fixed anchor, precision=highest, split fix ==="
timeout 2400 python .bench/quality_exp.py fixh_hst_r4 $A highest fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_fixn_hst_r4.log

echo "=== fixed anchor, precision=high, split fix ==="
timeout 2400 python .bench/quality_exp.py fixh_high_r4 $A high fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_fixn_high_r4.log

echo "=== fixed anchor, precision=default, split fix ==="
timeout 2400 python .bench/quality_exp.py fixh_def_r4 $A default fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_fixn_def_r4.log

echo "=== done ==="
