"""r1cs_nark_as verifier-gadget tests (reference
src/r1cs_nark_as/constraints/mod.rs test matrix analog — the composed gadget
calls the hp_as gadget internally)."""

import pytest

from test_r1cs_nark import DummyCircuit
from test_r1cs_nark_as import (NUM_CONSTRAINTS, NUM_VARIABLES, make_input_gen)
from accumulation_tpu.constraints import r1cs_nark_as_gadget as gadget
from accumulation_tpu.core.accumulation import MakeZK
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.schemes.r1cs_nark import R1CSNark
from accumulation_tpu.schemes.r1cs_nark_as import ASForR1CSNark


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = ASForR1CSNark(curve)
    nark = R1CSNark(curve)
    ipk, ivk = nark.index(DummyCircuit(
        num_variables=NUM_VARIABLES, num_constraints=NUM_CONSTRAINTS))
    keys = scheme.index(None, None, (ipk, ivk))
    return curve, scheme, keys, nark, ipk


@pytest.mark.parametrize("make_zk", [False, True], ids=["nozk", "zk"])
def test_gadget_verifies_native_accumulation(setup, rng, make_zk):
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, make_zk)
    inputs = gen(2)
    acc, proof = scheme.prove(
        keys[0], inputs, [],
        MakeZK.Enabled(rng) if make_zk else MakeZK.Disabled())
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    assert gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)


def test_gadget_with_old_accumulator(setup, rng):
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, False)
    acc1, _ = scheme.prove(keys[0], gen(1), [], None)
    inputs2 = gen(1)
    acc2, proof2 = scheme.prove(keys[0], inputs2, [acc1], None)
    assert gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs2], [acc1.instance],
        acc2.instance, proof2)


def test_gadget_rejects_tampered_instance(setup, rng):
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, False)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    from accumulation_tpu.schemes.r1cs_nark_as import AccumulatorInstance
    bad = AccumulatorInstance(
        acc.instance.r1cs_input, acc.instance.comm_b, acc.instance.comm_a,
        acc.instance.comm_c, acc.instance.hp_instance)
    assert not gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], bad, proof)


def test_costs_breakdown(setup, rng):
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, False)
    inputs = gen(2)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    counts = gadget.costs_breakdown(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)
    print("\nASForR1CSNark verifier gadget costs:", counts)
    assert counts["verify"] > 0


# remaining reference gadget shapes (src/constraints.rs:62-374)
import harness


@pytest.mark.parametrize(
    "shape", [harness.MULTIPLE_INPUTS_INIT, harness.ACCUMULATORS_ONLY,
              harness.NO_INPUTS_INIT, harness.MULTIPLE_INPUTS_ACCUMULATION],
    ids=["multi3", "accs_only", "zero_inputs", "multi_acc_1123"])
def test_gadget_shapes(setup, rng, shape):
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, False)
    assert harness.gadget_chain_template(
        "r1cs_nark_as", scheme, keys, gen, shape, False, rng)
