"""placeholder() PCD-setup constructors (reference
src/r1cs_nark_as/data_structures.rs:67-78,174-183,259-325).

A PCD circuit must be synthesizable before any real accumulation exists; the
placeholders carry the right *shapes* so the constraint system built from
them is identical in size to one built from live data.
"""

import pytest

from test_r1cs_nark import DummyCircuit
from test_r1cs_nark_as import (NUM_CONSTRAINTS, NUM_VARIABLES, make_input_gen)
from accumulation_tpu.constraints import r1cs_nark_as_gadget as gadget
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.schemes.r1cs_nark import R1CSNark
from accumulation_tpu.schemes.r1cs_nark_as import (
    AccumulatorInstance, ASForR1CSNark, InputInstance, Proof, VerifierKey)


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    scheme = ASForR1CSNark(curve)
    nark = R1CSNark(curve)
    ipk, ivk = nark.index(DummyCircuit(
        num_variables=NUM_VARIABLES, num_constraints=NUM_CONSTRAINTS))
    keys = scheme.index(None, None, (ipk, ivk))
    return curve, scheme, keys, nark, ipk


def _total(counts: dict) -> int:
    return sum(counts.values())


def test_placeholder_matches_real_circuit_shape(setup, rng):
    curve, scheme, keys, nark, ipk = setup
    input_len = ipk.index_info.num_instance_variables

    gen = make_input_gen(curve, nark, ipk, rng, False)
    inputs = gen(1)
    acc, proof = scheme.prove(keys[0], inputs, [], None)
    real_counts = gadget.costs_breakdown(
        curve, keys[1], [i.instance for i in inputs], [], acc.instance, proof)

    vk_ph = VerifierKey.placeholder(input_len)
    vk_ph.nark_matrices_hash = keys[1].nark_matrices_hash
    vk_ph.as_matrices_hash = keys[1].as_matrices_hash
    assert vk_ph.num_instance_variables == input_len
    input_ph = InputInstance.zero(curve, input_len, make_zk=False)
    acc_ph = AccumulatorInstance.placeholder(curve, input_len)
    proof_ph = Proof.placeholder(curve, input_len, 1, make_zk=False)
    ph_counts = gadget.costs_breakdown(
        curve, vk_ph, [input_ph], [], acc_ph, proof_ph)

    assert _total(ph_counts) == _total(real_counts), (
        f"placeholder circuit shape {ph_counts} != real {real_counts}")


def test_placeholder_zk_shapes(setup):
    curve = setup[0]
    proof = Proof.placeholder(curve, 3, 1, make_zk=True)
    # zk with a single input adds the dummy hp input: m = 2 -> 1 low/high comm
    assert proof.hp_proof.product_poly_comm_low.x.shape[0] == 1
    assert proof.hp_proof.hiding_comms is not None
    assert proof.randomness is not None
    assert proof.randomness.r1cs_r_input.shape[0] == 3
    # no inputs defaults to one
    proof0 = Proof.placeholder(curve, 3, 0, make_zk=False)
    assert proof0.hp_proof.product_poly_comm_low.x.shape[0] == 0
    assert proof0.randomness is None
