#!/bin/bash
# Round-4 session-2 serialized TPU queue — ONE TPU process at a time (two
# wedge the relay).  Assumes the tail-group split (ACCUM_TPU_FUSED_TAIL_GROUP)
# is in place: the 11-round fused tail graph was identified as the compile
# graph that OOM-SIGKILLed the remote helper during every 2^16 scheme-stage
# attempt (cache forensics: prologue + all big-round graphs landed, no
# jit__tail entry, SIGKILL timestamps match).
#
# Stage order favors the three missing recorded artifacts, cheapest first
# given today's cache: 2^16 scheme (big-round graphs warm; only the 3 tail
# groups compile), scaling resume (D=2 shard graph warm), pallas VPU, then
# the 2^20 set.
set -u
OUT=${1:-experiments/r04}
mkdir -p "$OUT"
export ACCUM_TPU_UNROLL_CARRIES=1 ACCUM_TPU_MSM_ENGINE=u32

stamp() { date -u +%H:%M:%S; }

echo "[queue] stage 0: 2^16 scheme bench with split tail  $(stamp)"
BENCH_SKIP_2E16=1 BENCH_N=65536 BENCH_SCHEME_LOG_DEGREE=16 \
  BENCH_DEADLINE_S=10200 timeout 10500 \
  python bench.py > "$OUT/bench_s16d.json" 2> "$OUT/bench_s16d.err"
echo "[queue] scheme16 rc=$? $(stamp)"

echo "[queue] stage 1: scaling efficiency resume @2^20  $(stamp)"
SCALING_CKPT=SCALING_r04.json timeout 10800 \
  python scripts/scaling_efficiency.py 20 8 > "$OUT/scaling_eff2.log" 2>&1
echo "[queue] scaling rc=$? $(stamp)"

echo "[queue] stage 2: pallas vpu sweep body @2^16  $(stamp)"
ACCUM_TPU_PALLAS_MUL=vpu ACCUM_TPU_PALLAS_CHUNK=8 ACCUM_TPU_PALLAS_LANE_BLK=512 \
  timeout 7200 python experiments/bench_pallas_vpu.py 16 8 \
  > "$OUT/pallas_vpu_16b.log" 2>&1
echo "[queue] pallas rc=$? $(stamp)"

echo "[queue] stage 3: prewarm 2^20 fused-open pivots  $(stamp)"
timeout 14400 python scripts/prewarm_fused.py --log-n 20 --jobs 1 --retries 3 \
  > "$OUT/prewarm20b.log" 2>&1
echo "[queue] prewarm rc=$? $(stamp)"

echo "[queue] stage 4: scheme bench @2^20  $(stamp)"
BENCH_SKIP_2E16=1 BENCH_SCHEME_LOG_DEGREE=20 \
  BENCH_DEADLINE_S=10500 timeout 10800 python bench.py \
  > "$OUT/bench_s20.json" 2> "$OUT/bench_s20.err"
echo "[queue] bench20 rc=$? $(stamp)"
echo "[queue] all stages done $(stamp)"
