#!/bin/bash
# Prewarm the STATIC-SPLIT fused graphs for the 2^16 flagship bench: the
# top-window replica split (r05) changed every fused bucket-sweep graph
# (rmsm halves + tail groups with half > SMALL_N_THRESHOLD).  _round_fold,
# _prologue, digits graphs and all host-path MSM graphs are unchanged and
# stay warm.
set -u
for spec in rmsm:65536,4,8192 rmsm:16384,4,2048 rmsm:4096,4,512 \
            tail:65536,0 tail:65536,1 tail:65536,2; do
  for att in 1 2 3; do
    timeout 2700 python scripts/prewarm_fused.py --one "$spec" && break
    echo "[queue] retry $spec (attempt $att)"
    sleep 30
  done
done
echo "[queue] split prewarm done"
