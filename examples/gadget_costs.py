"""Gadget cost-parity table: constraint counts for all four verifier gadgets.

Mirrors the reference's `print_costs_breakdown` run from
`simple_accumulation_test` (/root/reference/src/constraints.rs:206-306,336):
for each scheme, accumulate one input into an accumulator, fold one more
input + the old accumulator, and profile the in-circuit verify of that step
at the reference's own test shapes (hp vec_len 11, trivial/ipa degree 11,
nark DummyCircuit 5 inputs / 10 constraints — SURVEY.md §4 tier 2).

Output: a markdown table (stdout), checked into docs/PARITY.md.
Run: python examples/gadget_costs.py  (CPU backend is fine — counts are
circuit sizes, independent of the execution backend).  With no argument it
spawns one fresh interpreter per scheme — XLA:CPU deterministically
segfaults on heavy late compiles in loaded processes (CLAUDE.md).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# FORCE (not setdefault) the CPU env: the ambient environment pins
# JAX_PLATFORMS=axon, so a setdefault is a no-op and the package would
# point the persistent XLA cache at the AXON-keyed dir while the backend
# actually runs CPU — loading remote-machine AOT entries (SIGILL/segfault;
# CLAUDE.md cross-config cache trap)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# XLA:CPU's parallel LLVM codegen dies (ENOMEM / segfault) on the large
# fused-open graphs this example compiles while generating IPA inputs;
# single-threaded codegen is sturdy (same mitigation as tests/conftest.py)
if "xla_cpu_parallel_codegen_split_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_parallel_codegen_split_count=1"
                               ).strip()

import numpy as np

ALL_SCHEMES = ("hp_as", "trivial_pc_as", "ipa_pc_as", "r1cs_nark_as")


def main(only=None):
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from accumulation_tpu.constraints import verifier
    from accumulation_tpu.core.accumulation import MakeZK
    from accumulation_tpu.curves import PALLAS

    curve = PALLAS
    rng = np.random.default_rng(20260816)
    rows = []

    def profile(name, scheme, pk, vk, gen):
        acc1, _ = scheme.prove(pk, gen(1), [], None)
        inputs2 = gen(1)
        acc2, proof2 = scheme.prove(pk, inputs2, [acc1], None)
        counts = verifier.costs_breakdown(
            name, curve, vk, [i.instance for i in inputs2], [acc1.instance],
            acc2.instance, proof2)
        rows.append((name, counts))
        return counts

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))

    if only == "hp_as":
        # hp_as at vec_len 11 (reference src/hp_as/mod.rs:928-1152)
        from accumulation_tpu.schemes.hp_as import ASForHadamardProducts
        from test_hp_as import make_input_gen as hp_gen, VEC_LEN
        scheme = ASForHadamardProducts(curve)
        pk, vk, dk = scheme.index(None, None, VEC_LEN)
        profile("hp_as", scheme, pk, vk, hp_gen(curve, pk, rng, False))
    elif only == "trivial_pc_as":
        # trivial_pc_as at degree 11 (reference src/trivial_pc_as/mod.rs:635+)
        from accumulation_tpu.schemes.trivial_pc_as import ASForTrivialPC
        from test_trivial_pc_as import make_input_gen as tpc_gen, DEGREE as TDEG
        from accumulation_tpu.pc import trivial_pc
        scheme = ASForTrivialPC(curve)
        pp = trivial_pc.setup(curve, TDEG)
        pk, vk, dk = scheme.index(None, pp, TDEG)
        profile("trivial_pc_as", scheme, pk, vk, tpc_gen(curve, pk, rng))
    elif only == "ipa_pc_as":
        # ipa_pc_as at degree 11 (reference src/ipa_pc_as/mod.rs:859-1112)
        from accumulation_tpu.schemes.ipa_pc_as import (
            AtomicASForInnerProductArgPC, PredicateIndex)
        from test_ipa_pc_as import make_input_gen as ipa_gen, DEGREE as IDEG
        from accumulation_tpu.pc import ipa_pc
        scheme = AtomicASForInnerProductArgPC(curve)
        pp = ipa_pc.setup(curve, IDEG)
        pk, vk, dk = scheme.index(None, pp, PredicateIndex(IDEG, IDEG))
        profile("ipa_pc_as", scheme, pk, vk, ipa_gen(curve, pk, rng, False))
    elif only == "r1cs_nark_as":
        # r1cs_nark_as over DummyCircuit (reference src/r1cs_nark_as/mod.rs:1115+)
        from accumulation_tpu.schemes.r1cs_nark import R1CSNark
        from accumulation_tpu.schemes.r1cs_nark_as import ASForR1CSNark
        from test_r1cs_nark import DummyCircuit
        from test_r1cs_nark_as import (NUM_CONSTRAINTS, NUM_VARIABLES,
                                       make_input_gen as nark_gen)
        scheme = ASForR1CSNark(curve)
        nark = R1CSNark(curve)
        ipk, ivk = nark.index(DummyCircuit(
            num_variables=NUM_VARIABLES, num_constraints=NUM_CONSTRAINTS))
        pk, vk, dk = scheme.index(None, None, (ipk, ivk))
        profile("r1cs_nark_as", scheme, pk, vk,
                nark_gen(curve, nark, ipk, rng, False))
    else:
        raise SystemExit(f"unknown scheme {only}")

    cols = ["input_instances", "old_accumulators", "new_accumulator",
            "proof", "verify", "total"]
    for name, counts in rows:
        # raw dict first — a missing column must never lose the (hours-long)
        # synthesis result
        print(f"{name} counts: {counts}", flush=True)
        print(f"| {name} | " + " | ".join(
            f"{counts.get(c, 0):,}" for c in cols) + " |", flush=True)


COLS = ["input_instances", "old_accumulators", "new_accumulator",
        "proof", "verify", "total"]


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1])
    else:
        # one fresh interpreter per scheme (XLA:CPU segfault mitigation)
        print("| gadget | " + " | ".join(COLS) + " |")
        print("|---|" + "---|" * len(COLS))
        for name in ALL_SCHEMES:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=7200)
            for line in out.stdout.splitlines():
                if line.startswith("|"):
                    print(line, flush=True)
            if out.returncode != 0:
                print(f"| {name} | ERROR rc={out.returncode} |", flush=True)
