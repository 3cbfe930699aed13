#!/bin/bash
# Targeted prewarm of the graphs still missing for the 2^16 scheme stage
# (TAIL_MAX=1024 plan): the 16384/4096 pivot sets + the two smallest tail
# groups.  Each spec retried up to 3x (helper crashes are stochastic).
set -u
for spec in rmsm:16384,4,2048 rfold:16384 rmsm:4096,4,512 rfold:4096 \
            tail:65536,8 tail:65536,9; do
  for att in 1 2 3; do
    timeout 2400 python scripts/prewarm_fused.py --one "$spec" && break
    echo "[queue] retry $spec (attempt $att)"
    sleep 30
  done
done
echo "[queue] targeted prewarm done"
