#!/bin/bash
# Round-5 serial TPU queue (ONE process at a time — two wedge the relay).
# Run AFTER scripts/prewarm_fused.py --log-n 16 has filled the fused-open
# cache.  Stage order = VERDICT r04 priority: flagship number first.
set -u
OUT=${1:-experiments/r05}
mkdir -p "$OUT"

echo "=== stage 1: flagship bench (scheme 2^16 + msm 2^16/2^20) ==="
# deadline sized to the worst remaining cold graphs (commit MSM at 2^16
# c=8 and the 2^20 sweep are ~35 min EACH on the remote helper —
# bench.py:260 comments; r04 died launching 1200 s deadlines into these)
BENCH_DEADLINE_S=10200 timeout 10500 python bench.py \
  > "$OUT/bench_r05.json" 2> "$OUT/bench_r05.err"
echo "bench rc=$?"; tail -1 "$OUT/bench_r05.json"

echo "=== stage 2: hybrid Pallas VPU body measurement (VERDICT #4) ==="
ACCUM_TPU_PALLAS_MUL=vpu timeout 3600 \
  python experiments/bench_pallas_vpu.py 16 8 \
  > "$OUT/pallas_vpu_16.log" 2>&1
echo "pallas rc=$?"; grep RESULT "$OUT/pallas_vpu_16.log" || tail -3 "$OUT/pallas_vpu_16.log"

echo "=== stage 3: scaling D rows (VERDICT #5) ==="
[ -f SCALING_r05.json ] || cp SCALING_r04.json SCALING_r05.json
export ACCUM_TPU_UNROLL_CARRIES=1 ACCUM_TPU_MSM_ENGINE=u32
SCALING_CKPT=SCALING_r05.json timeout 5400 \
  python scripts/scaling_efficiency.py 20 8 32 8 2 \
  > "$OUT/scaling_eff.log" 2>&1
echo "scaling rc=$?"; cat SCALING_r05.json

echo "=== stage 4: hp-as TPU stage (VERDICT #9, BASELINE config #2) ==="
BENCH_HP_AS=1 BENCH_SKIP_SCHEME=1 BENCH_SKIP_2E16=1 BENCH_N=1024 \
  BENCH_DEADLINE_S=5400 timeout 5700 python bench.py \
  > "$OUT/bench_hp14.json" 2> "$OUT/bench_hp14.err"
echo "hp rc=$?"; tail -1 "$OUT/bench_hp14.json"
echo "=== queue done ==="
