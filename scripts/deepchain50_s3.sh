#!/bin/bash
# Session-3 bounded pass at the two missing depth-50 chain records (ipa,
# nark — hp and trivial already green at depth 50, see
# experiments/r04/deepchain50_test_{hp_as,trivial_pc_as}.log).  Full
# 12-param files need hours; the canonical chain shape is
# simple_accumulation (one old accumulator feeding back every iteration —
# the literal 50-deep chain of the reference's NUM_ITERATIONS=50,
# src/lib.rs:273), so record that shape zk+nozk per scheme, one fresh
# process per file (XLA:CPU late-compile segfault mitigation).
set -u
OUT=${1:-experiments/r04}
mkdir -p "$OUT"
export ACCUM_TEST_ITERS=50
for f in test_ipa_pc_as test_r1cs_nark_as; do
  log="$OUT/deepchain50_${f}_simpleacc.log"
  echo "=== $f simple_accumulation depth 50 ==="
  timeout 1500 python -m pytest "tests/${f}.py" -q -o addopts="" \
    -k "test_chain and simple_accumulation" > "$log" 2>&1
  echo "EXIT $?" >> "$log"
  tail -2 "$log"
done
