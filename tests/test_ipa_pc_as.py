"""AtomicASForInnerProductArgPC chain tests — mirrors the reference matrix
(/root/reference/src/ipa_pc_as/mod.rs:859-1112: six shapes at degree 11,
zk and non-zk)."""

import pytest

import harness
from accumulation_tpu.core.accumulation import InstanceWitnessPair
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.pc import ipa_pc
from accumulation_tpu.schemes.ipa_pc_as import (AtomicASForInnerProductArgPC,
                                                InputInstance, PredicateIndex)

DEGREE = harness.IPA_DEGREE  # 11 — rounds up to n = 16 internally


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = AtomicASForInnerProductArgPC(curve)
    pp = ipa_pc.setup(curve, DEGREE)
    keys = scheme.index(None, pp, PredicateIndex(DEGREE, DEGREE))
    return curve, scheme, keys


make_input_gen = harness.make_ipa_input_gen


SHAPES = {
    "single_input_init": harness.SINGLE_INPUT_INIT,
    "multiple_inputs_init": harness.MULTIPLE_INPUTS_INIT,
    "simple_accumulation": harness.SIMPLE_ACCUMULATION,
    "multiple_inputs_accumulation": harness.MULTIPLE_INPUTS_ACCUMULATION,
    "accumulators_only": harness.ACCUMULATORS_ONLY,
    "no_inputs_init": harness.NO_INPUTS_INIT,
}


@pytest.mark.parametrize("make_zk", [False, True], ids=["nozk", "zk"])
@pytest.mark.parametrize("shape_name", list(SHAPES))
def test_chain(setup, rng, shape_name, make_zk):
    curve, scheme, keys = setup
    if shape_name == "no_inputs_init" and make_zk:
        pass  # zk with zero inputs accumulates just the randomizer
    gen = make_input_gen(curve, keys[0], rng, make_zk)
    # each IPA prove is a full open — pin 1 iteration in CI
    iters = harness.pinned_iters(1)
    assert harness.test_template(
        scheme, keys, gen, SHAPES[shape_name], make_zk=make_zk, rng=rng,
        num_iterations=iters,
    )


def test_tampered_accumulator_rejected(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    bad = InputInstance(
        acc.instance.ipa_commitment, acc.instance.point,
        fp.add(curve.fr, acc.instance.evaluation, fp.from_int(curve.fr, 1)),
        acc.instance.ipa_proof)
    assert not scheme.verify(keys[1], [i.instance for i in inputs], [],
                             bad, proof)
    # decide rejects the tampered accumulator too
    assert not scheme.decide(keys[2], InstanceWitnessPair(bad, None))


def test_accumulator_feeds_back_as_input(setup, rng):
    """The produced accumulator is itself a valid scheme input."""
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(1)
    acc1, _ = scheme.prove(keys[0], inputs, [], None)
    acc2, proof2 = scheme.prove(keys[0], [acc1], [], None)
    assert scheme.verify(keys[1], [acc1.instance], [], acc2.instance, proof2)
    assert scheme.decide(keys[2], acc2)
