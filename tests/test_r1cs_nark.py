"""R1CS NARK tests — round trip + zk + tamper rejection (mirrors the
reference NARK test, /root/reference/src/r1cs_nark_as/r1cs_nark/mod.rs:464-556)."""

import numpy as np
import pytest

from accumulation_tpu.constraints import r1cs
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.schemes.r1cs_nark import R1CSNark


class DummyCircuit:
    """a * b = c repeated (reference DummyCircuit, r1cs_nark/mod.rs:477-507)."""

    def __init__(self, a=None, b=None, num_variables=10, num_constraints=8):
        self.a = a
        self.b = b
        self.num_variables = num_variables
        self.num_constraints = num_constraints

    def generate_constraints(self, cs: r1cs.ConstraintSystem):
        p = cs.spec.modulus
        a = cs.new_witness_variable(self.a)
        b = cs.new_witness_variable(self.b)
        c_val = None if self.a is None else self.a * self.b % p
        c = cs.new_input_variable(c_val)
        for _ in range(self.num_variables - 3):
            cs.new_witness_variable(0 if self.a is not None else None)
        for _ in range(self.num_constraints):
            cs.enforce_constraint(cs.lc((1, a)), cs.lc((1, b)), cs.lc((1, c)))


@pytest.fixture(scope="module")
def nark_setup():
    nark = R1CSNark(PALLAS)
    circuit = DummyCircuit(num_variables=10, num_constraints=8)
    ipk, ivk = nark.index(circuit)
    return nark, ipk, ivk


def _mk_circuit(rng):
    p = PALLAS.fr.modulus
    a = int.from_bytes(rng.bytes(40), "little") % p
    b = int.from_bytes(rng.bytes(40), "little") % p
    return DummyCircuit(a, b, 10, 8), [1, a * b % p]


def test_nark_roundtrip(nark_setup, rng):
    nark, ipk, ivk = nark_setup
    circuit, public_input = _mk_circuit(rng)
    proof = nark.prove(ipk, circuit)
    assert nark.verify(ivk, public_input, proof)


def test_nark_zk_roundtrip(nark_setup, rng):
    nark, ipk, ivk = nark_setup
    circuit, public_input = _mk_circuit(rng)
    proof = nark.prove(ipk, circuit, make_zk=True, rng=rng)
    assert proof.first_msg.randomness is not None
    assert nark.verify(ivk, public_input, proof)


def test_nark_wrong_input_rejected(nark_setup, rng):
    nark, ipk, ivk = nark_setup
    circuit, public_input = _mk_circuit(rng)
    proof = nark.prove(ipk, circuit)
    bad_input = [1, (public_input[1] + 1) % PALLAS.fr.modulus]
    assert not nark.verify(ivk, bad_input, proof)


def test_constraint_system_satisfaction(rng):
    circuit, _ = _mk_circuit(rng)
    cs = r1cs.ConstraintSystem(PALLAS.fr, r1cs.PROVE)
    circuit.generate_constraints(cs)
    cs.finalize()
    assert cs.is_satisfied()
    cs.instance_assignment[1] = (cs.instance_assignment[1] + 1) % PALLAS.fr.modulus
    assert not cs.is_satisfied()
