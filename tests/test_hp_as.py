"""ASForHadamardProducts chain tests — mirrors the reference matrix
(/root/reference/src/hp_as/mod.rs:928-1152: six shapes, vector length 11,
zk and non-zk)."""

import jax.numpy as jnp
import numpy as np
import pytest

import harness
from accumulation_tpu.core.accumulation import InstanceWitnessPair
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.pc import pedersen
from accumulation_tpu.schemes import hp_as
from accumulation_tpu.schemes.hp_as import (ASForHadamardProducts,
                                            InputInstance, InputWitness,
                                            InputWitnessRandomness)

VEC_LEN = 11


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = ASForHadamardProducts(curve)
    keys = scheme.index(None, None, VEC_LEN)
    return curve, scheme, keys


def make_input_gen(curve, ck, rng, make_zk):
    def generate(n):
        out = []
        for _ in range(n):
            a = fp.random_elements(curve.fr, rng, (VEC_LEN,))
            b = fp.random_elements(curve.fr, rng, (VEC_LEN,))
            prod = hp_as.compute_hp(curve, a, b)
            if make_zk:
                r1, r2, r3 = (fp.random_elements(curve.fr, rng, ()) for _ in range(3))
                rands = jnp.stack([r1, r2, r3])
                randomness = InputWitnessRandomness(r1, r2, r3)
            else:
                rands = None
                randomness = None
            comms = pedersen.commit_batched(
                curve, ck, jnp.stack([a, b, prod]), rands)
            inst = InputInstance(
                hp_as.common.unstack_affine(comms)[0],
                hp_as.common.unstack_affine(comms)[1],
                hp_as.common.unstack_affine(comms)[2],
            )
            out.append(InstanceWitnessPair(inst, InputWitness(a, b, randomness)))
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


@pytest.mark.parametrize("make_zk", [False, True], ids=["nozk", "zk"])
@pytest.mark.parametrize("shape_name", list(SHAPES))
def test_chain(setup, rng, shape_name, make_zk):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, make_zk)
    iters = harness.pinned_iters(1) if shape_name in (
        "no_inputs_init", "multiple_inputs_accumulation",
        "accumulators_only") else None
    assert harness.test_template(
        scheme, keys, gen, SHAPES[shape_name], make_zk=make_zk, rng=rng,
        num_iterations=iters,
    )


def test_tampered_accumulator_rejected(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(2)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    bad = InputInstance(acc.instance.comm_2, acc.instance.comm_1,
                        acc.instance.comm_3)
    assert not scheme.verify(keys[1], [i.instance for i in inputs], [],
                             bad, proof)


def test_decide_rejects_wrong_product(setup, rng):
    curve, scheme, keys = setup
    gen = make_input_gen(curve, keys[0], rng, False)
    inputs = gen(1)
    acc, _ = scheme.prove(keys[0], inputs, [], None)
    assert scheme.decide(keys[2], acc)
    bad_wit = InputWitness(
        acc.witness.a_vec.at[0].set(np.asarray(fp.from_int(curve.fr, 9))),
        acc.witness.b_vec, acc.witness.randomness)
    assert not scheme.decide(keys[2], InstanceWitnessPair(acc.instance, bad_wit))
