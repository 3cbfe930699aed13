"""ASForR1CSNark chain tests — mirrors the reference matrix
(/root/reference/src/r1cs_nark_as/mod.rs:1115-1396: six shapes, DummyCircuit,
zk and non-zk)."""

import numpy as np
import pytest

import harness
from test_r1cs_nark import DummyCircuit
from accumulation_tpu.core.accumulation import InstanceWitnessPair
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.ops.sponge import PoseidonSponge, R1CS_NARK_DOMAIN
from accumulation_tpu.schemes.r1cs_nark import R1CSNark
from accumulation_tpu.schemes.r1cs_nark_as import ASForR1CSNark, InputInstance

NUM_VARIABLES = 10
NUM_CONSTRAINTS = 8


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = ASForR1CSNark(curve)
    nark = R1CSNark(curve)
    ipk, ivk = nark.index(DummyCircuit(
        num_variables=NUM_VARIABLES, num_constraints=NUM_CONSTRAINTS))
    keys = scheme.index(None, None, (ipk, ivk))
    return curve, scheme, keys, nark, ipk


def make_input_gen(curve, nark, ipk, rng, make_zk):
    p = curve.fr.modulus

    def generate(n):
        out = []
        for _ in range(n):
            a = int.from_bytes(rng.bytes(40), "little") % p
            b = int.from_bytes(rng.bytes(40), "little") % p
            circuit = DummyCircuit(a, b, NUM_VARIABLES, NUM_CONSTRAINTS)
            # the NARK inside the AS uses the forked nark sponge
            nark_sponge = PoseidonSponge(curve.fq).fork(R1CS_NARK_DOMAIN)
            proof = nark.prove(ipk, circuit, make_zk=make_zk,
                               sponge=nark_sponge, rng=rng)
            pub = [1, a * b % p]
            inst = InputInstance(
                fp.array_from_ints(curve.fr, pub), proof.first_msg)
            out.append(InstanceWitnessPair(inst, proof.second_msg))
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
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, make_zk)
    assert harness.test_template(
        scheme, keys, gen, SHAPES[shape_name], make_zk=make_zk, rng=rng,
        num_iterations=harness.pinned_iters(1),
    )


def test_nark_proof_verifies_standalone(setup, rng):
    """Inputs generated for the AS are valid NARK proofs under the forked
    sponge (composability check)."""
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, False)
    pair = gen(1)[0]
    from accumulation_tpu.schemes.r1cs_nark import Proof as NarkProof
    proof = NarkProof(pair.instance.first_round_message, pair.witness)
    pub = fp.array_to_ints(curve.fr, pair.instance.r1cs_input)
    sponge = PoseidonSponge(curve.fq).fork(R1CS_NARK_DOMAIN)
    assert nark.verify(ipk, pub, proof, sponge=sponge)


def test_tampered_accumulator_rejected(setup, rng):
    curve, scheme, keys, nark, ipk = setup
    gen = make_input_gen(curve, nark, ipk, rng, False)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    assert scheme.verify(keys[1], [i.instance for i in inputs], [],
                         acc.instance, proof)
    assert scheme.decide(keys[2], acc)
    from accumulation_tpu.schemes.r1cs_nark_as import AccumulatorInstance
    bad = AccumulatorInstance(
        acc.instance.r1cs_input, acc.instance.comm_b, acc.instance.comm_a,
        acc.instance.comm_c, acc.instance.hp_instance)
    assert not scheme.verify(keys[1], [i.instance for i in inputs], [],
                             bad, proof)
