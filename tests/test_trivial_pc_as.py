"""ASForTrivialPC chain tests — mirrors the reference test matrix
(/root/reference/src/trivial_pc_as/mod.rs:635-795: six shapes at degree 11,
no zk, Pallas + Poseidon)."""

import numpy as np
import pytest

import harness
from accumulation_tpu.core.accumulation import InstanceWitnessPair
from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.ops import poly as poly_ops
from accumulation_tpu.pc import trivial_pc
from accumulation_tpu.schemes.trivial_pc_as import ASForTrivialPC, InputInstance

DEGREE = 11


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = ASForTrivialPC(curve)
    pp = trivial_pc.setup(curve, DEGREE)
    keys = scheme.index(None, pp, DEGREE)
    return curve, scheme, keys


def make_input_gen(curve, ck, rng):
    def generate(n):
        out = []
        for _ in range(n):
            coeffs = fp.random_elements(curve.fr, rng, (DEGREE + 1,))
            point = fp.random_elements(curve.fr, rng, ())
            value = poly_ops.evaluate(curve.fr, coeffs, point)
            comm = trivial_pc.commit(curve, ck, coeffs)
            inst = InputInstance(commitment=comm, point=point, eval=value)
            out.append(InstanceWitnessPair(inst, coeffs))
        return out
    return generate


SHAPES = {
    "single_input_init": harness.SINGLE_INPUT_INIT,
    "multiple_inputs_init": harness.MULTIPLE_INPUTS_INIT,
    "simple_accumulation": harness.SIMPLE_ACCUMULATION,
    "multiple_inputs_accumulation": harness.MULTIPLE_INPUTS_ACCUMULATION,
    "accumulators_only": harness.ACCUMULATORS_ONLY,
    "no_inputs_init": harness.NO_INPUTS_INIT,
}


@pytest.mark.parametrize("shape_name", list(SHAPES))
def test_chain(setup, rng, shape_name):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    iters = harness.pinned_iters(1) if shape_name in (
        "no_inputs_init", "multiple_inputs_accumulation") else None
    assert harness.test_template(
        scheme, keys, gen, SHAPES[shape_name], make_zk=False, rng=rng,
        num_iterations=iters,
    )


def test_tampered_proof_rejected(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    inputs = gen(2)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    # tamper: swap an eval in the proof
    bad = fp.add(curve.fr, proof[0].eval, fp.from_int(curve.fr, 1))
    proof[0].eval = bad
    assert not scheme.verify(keys[1], [i.instance for i in inputs], [],
                             acc.instance, proof)


def test_wrong_accumulator_rejected(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    bad_inst = InputInstance(
        commitment=acc.instance.commitment,
        point=acc.instance.point,
        eval=fp.add(curve.fr, acc.instance.eval, fp.from_int(curve.fr, 1)),
    )
    assert not scheme.verify(keys[1], [i.instance for i in inputs], [],
                             bad_inst, proof)


def test_decide_rejects_tampered_witness(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng)
    inputs = gen(1)
    acc, _ = scheme.prove(keys[0], inputs, [], None)
    assert scheme.decide(keys[2], acc)
    bad_witness = acc.witness.at[0].set(
        np.asarray(fp.from_int(curve.fr, 12345)))
    assert not scheme.decide(
        keys[2], InstanceWitnessPair(acc.instance, bad_witness))
