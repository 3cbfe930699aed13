#!/bin/bash
# Optional follow-up TPU stage for session 3: finish SCALING_r04.json's
# missing D rows via the checkpoint-resume path (t1_s is already recorded,
# so only the per-shard graphs compile).  Smallest shards first — they
# compile fastest, and every completed D row is checkpointed immediately.
# Run ONLY when no other TPU process is live, and keep the hard timeout:
# the queue must be dead before the driver's end-of-round bench.
set -u
OUT=${1:-experiments/r04}
T=${2:-900}
export ACCUM_TPU_UNROLL_CARRIES=1 ACCUM_TPU_MSM_ENGINE=u32
SCALING_CKPT=SCALING_r04.json timeout "$T" \
  python scripts/scaling_efficiency.py 20 8 32 8 2 \
  > "$OUT/scaling_eff_s3.log" 2>&1
echo "scaling rc=$?"
cat SCALING_r04.json
