#!/bin/bash
# VERDICT r3 item 3: run the flagship fixed-label recipe to completion at the
# FULL 58,862-image set (blocked engine) and record per-sweep held-out
# accuracy.  Uses the committed examples/input_fixedL_fullset_fixed_label
# verbatim (precision=highest, monotone, keep_best).
set -x
WD=$(mktemp -d /tmp/fullset_r4_XXXX)
cd "$WD"
cp /root/repo/examples/input_fixedL_fullset_fixed_label input
export PYTHONPATH=/root/repo:/root/.axon_site
date -u
timeout 5400 python -m tnml_tpu.apps.fixedL input 2>&1 | grep -v '^WARNING'
date -u
echo "workdir: $WD"
