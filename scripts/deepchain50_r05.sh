#!/bin/bash
# The one missing depth-50 chain record: ipa_pc_as simple_accumulation
# (zk + nozk) at the reference's NUM_ITERATIONS=50
# (/root/reference/src/lib.rs:273).  r04's attempts died at 1500 s
# timeouts MID-COMPILE (EXIT 124, experiments/r04/deepchain50_test_ipa_pc_as*
# .log) — the run is compile-bound, not work-bound (nark's equivalent
# passed in 21 min).  One dedicated process, honest multi-hour timeout.
set -u
OUT=${1:-experiments/r05}
T=${2:-10800}
mkdir -p "$OUT"
log="$OUT/deepchain50_ipa_simpleacc.log"
echo "=== ipa_pc_as simple_accumulation depth 50 (timeout ${T}s) ==="
ACCUM_TEST_ITERS=50 timeout "$T" \
  python -m pytest tests/test_ipa_pc_as.py -q -o addopts="" \
  -k "test_chain and simple_accumulation" > "$log" 2>&1
echo "EXIT $?" >> "$log"
tail -3 "$log"
