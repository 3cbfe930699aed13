#!/bin/bash
# One fresh pytest process per test file (sequential): immune to the
# xdist worker "node down" crashes and the cumulative-compile segfault.
# Results are named per file; safe to interrupt (log is incremental).
set -u
OUT=experiments/r05/suite_perfile.log
: > "$OUT"
for f in test_errors test_ark_kat test_serialize test_sponge test_poly \
         test_fields test_curves test_vesta test_bls12_381 test_fp8 \
         test_poseidon_security test_ipa_pc test_fused_open test_soundness \
         test_placeholders test_msm test_msm_pallas test_jit_pipeline \
         test_multihost test_hp_as test_trivial_pc_as test_r1cs_nark \
         test_ipa_pc_as test_r1cs_nark_as test_hp_gadget \
         test_trivial_pc_gadget test_ipa_as_gadget test_nark_as_gadget \
         test_multihost_ipa; do
  t0=$(date +%s)
  timeout 2700 python -m pytest "tests/${f}.py" -q -o addopts= \
    -p no:cacheprovider > /tmp/pf_out.txt 2>&1
  rc=$?
  line=$(grep -E "passed|failed|error" /tmp/pf_out.txt | tail -1)
  echo "$f: rc=$rc ($(($(date +%s)-t0))s) $line" >> "$OUT"
  if [ "$rc" != "0" ]; then
    echo "--- $f failure detail ---" >> "$OUT"
    tail -40 /tmp/pf_out.txt >> "$OUT"
  fi
done
echo "PERFILE DONE" >> "$OUT"
