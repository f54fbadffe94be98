#!/bin/bash
# Round-5 flagship measurement legs (VERDICT r4 items 3/7/8), sequential:
#  A: committed full-set recipe with the round-5 defaults (precision=high via
#     resolved_precision, GATED monotone acceptance) — per-sweep [sweep-timing]
#     split attributes the app path; compare 19.7 s/sweep (r4 ungated quality
#     run, q_fullset_high_r4.log) and the 14.9 s bench core.
#  B: same + TNML_REBUILD_CARRY=bf16 TNML_REBUILD_NONORM=1 — the quality gate
#     for promoting the -2.0% rebuild knobs (VERDICT item 8): must hold
#     100.00% held-out like the control.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site

WD=$(mktemp -d /tmp/r5_flagA_XXXX); cd "$WD"
sed 's/^precision = highest/\/\/ precision: resolved default (fixed regime -> high since round 5)/' \
  /root/repo/examples/input_fixedL_fullset_fixed_label > input
grep -n "precision\|Nsweep" input
date -u
timeout 4200 python -u -m tnml_tpu.apps.fixedL input 2>&1 | grep -v '^WARNING' \
  | tee /root/repo/.bench/r5_flagship_gated.log
date -u; echo "workdir A: $WD"

WD=$(mktemp -d /tmp/r5_flagB_XXXX); cd "$WD"
sed 's/^precision = highest/\/\/ precision: resolved default (high)/' \
  /root/repo/examples/input_fixedL_fullset_fixed_label > input
date -u
TNML_REBUILD_CARRY=bf16 TNML_REBUILD_NONORM=1 \
timeout 4200 python -u -m tnml_tpu.apps.fixedL input 2>&1 | grep -v '^WARNING' \
  | tee /root/repo/.bench/r5_flagship_carry.log
date -u; echo "workdir B: $WD"
echo "=== flagship legs done ==="
