"""hp_as verifier-gadget tests — mirrors the reference gadget harness
(/root/reference/src/constraints.rs:107-204 + src/hp_as/constraints/mod.rs
tests): native prover produces an accumulator, the gadget re-verifies it
in-circuit, and the constraint system must be satisfied; tampering must
break satisfaction.  Also prints the constraint-cost breakdown
(print_costs_breakdown analog, src/constraints.rs:206-306)."""

import numpy as np
import pytest

from test_hp_as import make_input_gen, VEC_LEN
from accumulation_tpu.constraints import hp_as_gadget
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.schemes.hp_as import ASForHadamardProducts, InputInstance


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = ASForHadamardProducts(curve)
    keys = scheme.index(None, None, VEC_LEN)
    return curve, scheme, keys


@pytest.mark.parametrize("make_zk", [False, True], ids=["nozk", "zk"])
def test_gadget_verifies_native_accumulation(setup, rng, make_zk):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, make_zk)
    inputs = gen(2)
    from accumulation_tpu.core.accumulation import MakeZK
    acc, proof = scheme.prove(
        keys[0], inputs, [],
        MakeZK.Enabled(rng) if make_zk else MakeZK.Disabled())
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    ok = hp_as_gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)
    assert ok, "gadget constraint system unsatisfied for honest accumulation"


def test_gadget_rejects_tampered_instance(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(2)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    bad = InputInstance(acc.instance.comm_2, acc.instance.comm_1,
                        acc.instance.comm_3)
    ok = hp_as_gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], bad, proof)
    assert not ok, "gadget accepted a tampered accumulator"


def test_gadget_with_old_accumulator(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(1)
    acc1, _ = scheme.prove(keys[0], inputs, [], None)
    inputs2 = gen(1)
    acc2, proof2 = scheme.prove(keys[0], inputs2, [acc1], None)
    ok = hp_as_gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs2], [acc1.instance],
        acc2.instance, proof2)
    assert ok


def test_costs_breakdown(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(2)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    counts = hp_as_gadget.costs_breakdown(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)
    print("\nASForHP verifier gadget costs:", counts)
    assert counts["verify"] > 0
    assert counts["total"] == sum(
        v for k, v in counts.items() if k != "total")


def test_generic_verifier_registry(setup, rng):
    """The uniform L6 entry point (reference ASVerifierGadget trait role)."""
    from accumulation_tpu.constraints import verifier
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    assert verifier.synthesize_and_check(
        "hp_as", curve, keys[1], [i.instance for i in inputs], [],
        acc.instance, proof)
    counts = verifier.print_costs_breakdown(
        "hp_as", curve, keys[1], [i.instance for i in inputs], [],
        acc.instance, proof)
    assert counts["total"] > 0


# the reference gadget harness runs ALL six shapes (src/constraints.rs:62-374);
# [1] and [1,1] are covered above — these close the multi-input, accumulators-
# only, zero-input, and [1,1,2,3] chain (old-accumulator + proof reuse) gaps
import harness


@pytest.mark.parametrize(
    "shape", [harness.MULTIPLE_INPUTS_INIT, harness.ACCUMULATORS_ONLY,
              harness.NO_INPUTS_INIT, harness.MULTIPLE_INPUTS_ACCUMULATION],
    ids=["multi3", "accs_only", "zero_inputs", "multi_acc_1123"])
def test_gadget_shapes(setup, rng, shape):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    assert harness.gadget_chain_template(
        "hp_as", scheme, keys, gen, shape, False, rng)
