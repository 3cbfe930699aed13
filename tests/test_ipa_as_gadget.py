"""ipa_pc_as verifier-gadget tests (reference
src/ipa_pc_as/constraints/mod.rs test matrix analog)."""

import pytest

from harness import IPA_DEGREE as DEGREE, make_ipa_input_gen as make_input_gen
from accumulation_tpu.constraints import ipa_pc_as_gadget as gadget
from accumulation_tpu.core.accumulation import MakeZK
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.pc import ipa_pc
from accumulation_tpu.schemes.ipa_pc_as import (AtomicASForInnerProductArgPC,
                                                InputInstance, PredicateIndex)


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = AtomicASForInnerProductArgPC(curve)
    pp = ipa_pc.setup(curve, DEGREE)
    keys = scheme.index(None, pp, PredicateIndex(DEGREE, DEGREE))
    return curve, scheme, keys


@pytest.mark.parametrize("make_zk", [False, True], ids=["nozk", "zk"])
def test_gadget_verifies_native_accumulation(setup, rng, make_zk):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, make_zk)
    inputs = gen(1)
    acc, proof = scheme.prove(
        keys[0], inputs, [],
        MakeZK.Enabled(rng) if make_zk else MakeZK.Disabled())
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    assert gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)


def test_gadget_with_old_accumulator(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    acc1, _ = scheme.prove(keys[0], gen(1), [], None)
    inputs2 = gen(1)
    acc2, proof2 = scheme.prove(keys[0], inputs2, [acc1], None)
    assert gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs2], [acc1.instance],
        acc2.instance, proof2)


def test_gadget_rejects_tampered_instance(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    bad = InputInstance(
        acc.instance.ipa_commitment, acc.instance.point,
        fp.add(curve.fr, acc.instance.evaluation, fp.from_int(curve.fr, 1)),
        acc.instance.ipa_proof)
    assert not gadget.synthesize_and_check(
        curve, keys[1], [i.instance for i in inputs], [], bad, proof)


# remaining reference gadget shapes (src/constraints.rs:62-374)
import harness


@pytest.mark.parametrize(
    "shape", [harness.MULTIPLE_INPUTS_INIT, harness.ACCUMULATORS_ONLY,
              harness.NO_INPUTS_INIT, harness.MULTIPLE_INPUTS_ACCUMULATION],
    ids=["multi3", "accs_only", "zero_inputs", "multi_acc_1123"])
def test_gadget_shapes(setup, rng, shape):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    assert harness.gadget_chain_template(
        "ipa_pc_as", scheme, keys, gen, shape, False, rng)
