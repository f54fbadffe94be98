#!/bin/bash
# Round-5 bf16 root-cause chain (VERDICT r4 item 5): at GLOBAL precision=default
# (single-pass bf16 operands), pin ONE subsystem at a time to 'highest' and see
# which restores the high/highest behavior on the fixed anchor.
#
# Baseline signatures on the anchor (740/label, normal map rescale 0.1, fixed
# label, monotone, ramp 40..120, 12 sweeps):
#   highest / high (r4): rej 0-13/sweep, cost/NT ~0.021-0.023 @ sweep 11
#   true default (r4, .bench/quality_fixn_def2_r4.log): rej ~300-380/sweep,
#     cost/NT 0.0266 @ sweep 11 — quality rescued by monotone, perf poisoned
#
# All legs run UNGATED monotone (TNML_MONOTONE_GATE=0) for diagnostic parity
# with the round-4 logs (the gated form trusts the CG line-search identity,
# which bf16 data passes may violate).  Sequential — one TPU process at a time.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export TNML_MONOTONE_GATE=0

A="740 12 4 3e-2 40,60,80,100,120 1e-10 1.0"

echo "=== E1: true default, no knobs (reproduce def2) ==="
timeout 2400 python .bench/quality_exp.py r5e1_def $A default fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_r5e1_def.log

echo "=== E2: default + split at highest ==="
TNML_SPLIT_PRECISION=highest \
timeout 2400 python .bench/quality_exp.py r5e2_split $A default fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_r5e2_split.log

echo "=== E3: default + first CG pass at highest ==="
TNML_GRAD0_PRECISION=highest \
timeout 2400 python .bench/quality_exp.py r5e3_grad0 $A default fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_r5e3_grad0.log

echo "=== E4: default + both ==="
TNML_SPLIT_PRECISION=highest TNML_GRAD0_PRECISION=highest \
timeout 2400 python .bench/quality_exp.py r5e4_both $A default fixed 1 normal 2 0.1 \
  2>&1 | grep -v '^WARNING' | tee .bench/quality_r5e4_both.log

echo "=== done ==="
