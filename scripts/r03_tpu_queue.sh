#!/bin/bash
# Round-3 TPU work queue: strictly sequential so no two big graphs compile
# concurrently (the remote compile helper OOMs otherwise — CLAUDE.md).
# 1. bench.py with the flagship at 2^16 (compile-feasible cold) -> recorded
#    MSM 2^16/2^20 + ipa_pc_as stage numbers, and warms the MSM graphs.
# 2. scaling_efficiency model at 2^20 -> SCALING_r03.json line.
# 3. prewarm the 2^20 fused-open graph set (--jobs 1) so the driver's
#    end-of-round bench.py (scheme at 2^20) hits a warm cache.
set -u
cd /root/repo
R=experiments/r03

echo "[queue] stage 1: bench (scheme@2^16)  $(date -u +%T)"
BENCH_SCHEME_LOG_DEGREE=16 BENCH_DEADLINE_S=1900 timeout 2100 \
  python bench.py > $R/bench_s16.json 2> $R/bench_s16.err
echo "[queue] bench rc=$? $(date -u +%T)"

echo "[queue] stage 2: scaling efficiency  $(date -u +%T)"
timeout 1500 python scripts/scaling_efficiency.py 20 8 \
  > $R/scaling.json 2> $R/scaling.err
echo "[queue] scaling rc=$? $(date -u +%T)"

echo "[queue] stage 3: prewarm 2^20 fused open  $(date -u +%T)"
timeout 10800 python scripts/prewarm_fused.py --log-n 20 --jobs 1 \
  > $R/prewarm_final.log 2>&1
echo "[queue] prewarm rc=$? $(date -u +%T)"
