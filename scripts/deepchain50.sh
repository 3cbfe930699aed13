#!/bin/bash
# 50-deep accumulation chains (reference NUM_ITERATIONS=50,
# /root/reference/src/lib.rs:273) with the XLA:CPU late-compile-segfault
# mitigations the repo uses elsewhere (CLAUDE.md): ONE pytest process per
# scheme file, run sequentially — a late-compile crash in one scheme
# cannot take down the others, and per-process compile volume stays
# bounded.  Each file's exit code is recorded; reruns can skip green files.
#
# Usage: bash scripts/deepchain50.sh <outdir>
set -u
OUT=${1:-experiments/r04}
mkdir -p "$OUT"
export ACCUM_TEST_ITERS=50
for f in test_hp_as test_trivial_pc_as test_ipa_pc_as test_r1cs_nark_as; do
  log="$OUT/deepchain50_${f}.log"
  if [ -f "$log" ] && grep -q "EXIT 0" "$log"; then
    echo "skip $f (already green)"; continue
  fi
  echo "=== $f (ACCUM_TEST_ITERS=50) ==="
  timeout 10800 python -m pytest "tests/${f}.py" -q -n 1 > "$log" 2>&1
  echo "EXIT $?" >> "$log"
  tail -2 "$log"
done
