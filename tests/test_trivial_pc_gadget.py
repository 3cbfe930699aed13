"""trivial_pc_as verifier-gadget tests (reference
src/trivial_pc_as/constraints/mod.rs test matrix analog)."""

import pytest

from test_trivial_pc_as import DEGREE, make_input_gen
from accumulation_tpu.constraints import trivial_pc_as_gadget as gadget
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.pc import trivial_pc
from accumulation_tpu.schemes.trivial_pc_as import ASForTrivialPC, InputInstance


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = ASForTrivialPC(curve)
    pp = trivial_pc.setup(curve, DEGREE)
    keys = scheme.index(None, pp, DEGREE)
    return curve, scheme, keys


def test_gadget_verifies_native_accumulation(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    inputs = gen(2)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    assert gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)


def test_gadget_with_old_accumulator(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    inputs = gen(1)
    acc1, _ = scheme.prove(keys[0], inputs, [], None)
    inputs2 = gen(1)
    acc2, proof2 = scheme.prove(keys[0], inputs2, [acc1], None)
    assert gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs2], [acc1.instance],
        acc2.instance, proof2)


def test_gadget_rejects_tampered_eval(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    bad = InputInstance(
        acc.instance.commitment, acc.instance.point,
        fp.add(curve.fr, acc.instance.eval, fp.from_int(curve.fr, 1)))
    assert not gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], bad, proof)


def test_costs_breakdown(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    inputs = gen(2)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    counts = gadget.costs_breakdown(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)
    print("\nASForTrivialPC verifier gadget costs:", counts)
    assert counts["verify"] > 0


# remaining reference gadget shapes (src/constraints.rs:62-374)
import harness


@pytest.mark.parametrize(
    "shape", [harness.MULTIPLE_INPUTS_INIT, harness.ACCUMULATORS_ONLY,
              harness.NO_INPUTS_INIT, harness.MULTIPLE_INPUTS_ACCUMULATION],
    ids=["multi3", "accs_only", "zero_inputs", "multi_acc_1123"])
def test_gadget_shapes(setup, rng, shape):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    assert harness.gadget_chain_template(
        "trivial_pc_as", scheme, keys, gen, shape, False, rng)
