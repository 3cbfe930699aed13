#!/bin/bash
# Round-4 serialized TPU queue — ONE TPU process at a time (two wedge the
# relay).  Stage order favors recorded artifacts: VPU kernel measurement,
# scaling-efficiency artifact, 2^20 fused-open prewarm, 2^20 scheme bench.
# All stages run the REDUCED unroll graphs: the default 2^16 sweep graph
# OOM-kills this deployment's compile helper (experiments/r03/bench_s16.err,
# r04 rediscovery), and the reduced graphs measured FASTER anyway
# (36.5k vs 35.3k pts/s at 2^16).
set -u
OUT=${1:-experiments/r04}
mkdir -p "$OUT"
export ACCUM_TPU_SWEEP_CHUNK=4 ACCUM_TPU_AGG_UNROLL=2 ACCUM_TPU_DBL_UNROLL=2
export ACCUM_TPU_UNROLL_CARRIES=1 ACCUM_TPU_MSM_ENGINE=u32

stamp() { date -u +%H:%M:%S; }

# wait for any live bench.py client to finish (max 3h)
for i in $(seq 1 1080); do
  pgrep -f "python bench.py" > /dev/null 2>&1 || break
  sleep 10
done

echo "[queue] stage 0: finish the 2^16 scheme bench (warm resume)  $(stamp)"
# the first full bench's deadline typically fires mid-scheme-compile; the
# finished compiles persist in the XLA cache, so a rerun resumes and
# completes.  BENCH_N=65536 keeps the big-MSM stage on cached graphs.
BENCH_SKIP_2E16=1 BENCH_N=65536 BENCH_FORCE_REDUCED=1 \
  BENCH_SCHEME_LOG_DEGREE=16 BENCH_DEADLINE_S=10200 timeout 10500 \
  python bench.py > "$OUT/bench_s16_resume.json" 2> "$OUT/bench_s16_resume.err"
echo "[queue] scheme16 rc=$? $(stamp)"

echo "[queue] stage 1: pallas vpu sweep body @2^16  $(stamp)"
ACCUM_TPU_PALLAS_MUL=vpu ACCUM_TPU_PALLAS_CHUNK=8 ACCUM_TPU_PALLAS_LANE_BLK=512 \
  timeout 7200 python experiments/bench_pallas_vpu.py 16 8 \
  > "$OUT/pallas_vpu_16.log" 2>&1
echo "[queue] pallas rc=$? $(stamp)"

echo "[queue] stage 2: scaling efficiency @2^20  $(stamp)"
SCALING_CKPT=SCALING_r04.json timeout 10800 \
  python scripts/scaling_efficiency.py 20 8 > "$OUT/scaling_eff.log" 2>&1
echo "[queue] scaling rc=$? $(stamp)"

echo "[queue] stage 3: prewarm 2^20 fused-open pivots  $(stamp)"
timeout 14400 python scripts/prewarm_fused.py --log-n 20 --jobs 1 --retries 3 \
  > "$OUT/prewarm20.log" 2>&1
echo "[queue] prewarm rc=$? $(stamp)"

echo "[queue] stage 4: scheme bench @2^20  $(stamp)"
BENCH_SKIP_2E16=1 BENCH_FORCE_REDUCED=1 BENCH_SCHEME_LOG_DEGREE=20 \
  BENCH_DEADLINE_S=10500 timeout 10800 python bench.py \
  > "$OUT/bench_s20.json" 2> "$OUT/bench_s20.err"
echo "[queue] bench20 rc=$? $(stamp)"
echo "[queue] all stages done $(stamp)"
