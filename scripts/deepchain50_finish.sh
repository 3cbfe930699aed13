#!/bin/bash
# Finish the 50-deep chain record (reference NUM_ITERATIONS=50): the ipa
# and nark files are the two still missing after r04's first pass (ipa hit
# its 3 h timeout; nark's run died with the session).  Halve per-process
# XLA:CPU compile volume — and make the job resumable — by running each
# file's chain tests as separate nozk / zk processes.
set -u
OUT=${1:-experiments/r04}
mkdir -p "$OUT"
export ACCUM_TEST_ITERS=50
for spec in "test_ipa_pc_as:test_chain and nozk" "test_ipa_pc_as:test_chain and zk" \
            "test_r1cs_nark_as:test_chain and nozk" "test_r1cs_nark_as:test_chain and zk"; do
  f=${spec%%:*}; k=${spec#*:}
  tag=$(echo "$k" | tr -cd 'a-z_' | tail -c 20)
  log="$OUT/deepchain50_${f}_${tag}.log"
  if [ -f "$log" ] && grep -q "EXIT 0" "$log"; then
    echo "skip $f/$k (already green)"; continue
  fi
  echo "=== $f -k '$k' (ACCUM_TEST_ITERS=50) ==="
  timeout 18000 python -m pytest "tests/${f}.py" -q -o addopts="" -k "$k" \
    > "$log" 2>&1
  echo "EXIT $?" >> "$log"
  tail -2 "$log"
done
