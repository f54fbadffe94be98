#!/bin/bash
# One-vs-rest family + warm-start compositions at FULL scale (VERDICT r4 item 4).
# Sequential: the TPU is single-claim.  nt=6000/label = the full 58,862-image
# synthetic train set (the reference single.cc default scales to 60k).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 3000 python -u .bench/r5_family.py singles 6000 6 64 \
  2>&1 | grep -v '^WARNING' | tee .bench/r5_singles_full.log
timeout 3000 python -u .bench/r5_family.py merge 6000 8 120 \
  2>&1 | grep -v '^WARNING' | tee .bench/r5_merge_full.log
timeout 3000 python -u .bench/r5_family.py cold 6000 8 120 \
  2>&1 | grep -v '^WARNING' | tee .bench/r5_cold_full.log
timeout 3600 python -u .bench/r5_family.py linear_init 6000 8 120 \
  2>&1 | grep -v '^WARNING' | tee .bench/r5_linear_init_full.log
echo "=== family chain done ==="
