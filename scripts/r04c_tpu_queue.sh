#!/bin/bash
# Round-4 session-3 serialized TPU queue (fresh container, COLD cache).
# Goal: record the flagship ipa_pc_as scheme numbers at 2^16 and leave the
# cache warm for the driver's end-of-round bench (bench.py now runs the
# scheme stage FIRST, so a warm-scheme cache guarantees the ipa_as_* keys
# land in BENCH_r04.json even if the MSM stages then hit the deadline).
#
# Stage 1 prewarms the fused-open graph set with per-graph subprocess
# isolation + retries (a helper SIGKILL costs one graph, not the queue);
# stage 2 runs the scheme-only bench on the warm prefix.  Total worst-case
# wall: 25 + 28 min — hard-bounded so the queue is DEAD before the
# driver's end-of-round bench can start (two TPU procs wedge the relay).
# The env exports match bench.py's setdefaults so prewarmed graphs hit the
# same cache entries.
set -u
OUT=${1:-experiments/r04}
mkdir -p "$OUT"
export ACCUM_TPU_UNROLL_CARRIES=1 ACCUM_TPU_MSM_ENGINE=u32

stamp() { date -u +%H:%M:%S; }

echo "[queue] stage 1: prewarm 2^16 fused-open graphs  $(stamp)"
timeout 1500 python scripts/prewarm_fused.py --log-n 16 --jobs 1 --retries 3 \
  > "$OUT/prewarm16_s3.log" 2>&1
echo "[queue] prewarm rc=$? $(stamp)"

echo "[queue] stage 2: scheme bench @2^16 (split tail)  $(stamp)"
BENCH_SKIP_2E16=1 BENCH_N=4096 BENCH_SCHEME_LOG_DEGREE=16 \
  BENCH_DEADLINE_S=1560 timeout 1680 \
  python bench.py > "$OUT/bench_s16e.json" 2> "$OUT/bench_s16e.err"
echo "[queue] bench rc=$? $(stamp)"
echo "[queue] all stages done $(stamp)"
