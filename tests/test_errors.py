"""Typed error-path parity (reference ASError semantics, src/error.rs +
per-scheme structure checks: errors on malformed prover inputs, False from
verifiers on bad proofs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from accumulation_tpu.core import errors
from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.pc import pedersen
from accumulation_tpu.schemes import hp_as
from accumulation_tpu.schemes.hp_as import (ASForHadamardProducts,
                                            InputInstance, InputWitness,
                                            InputWitnessRandomness)

VEC = 4


@pytest.fixture(scope="module")
def hp_setup():
    scheme = ASForHadamardProducts(PALLAS)
    keys = scheme.index(None, None, VEC)
    return scheme, keys


def _hp_input(curve, ck, rng, n=VEC, zk=False):
    a = fp.random_elements(curve.fr, rng, (n,))
    b = fp.random_elements(curve.fr, rng, (n,))
    prod = hp_as.compute_hp(curve, a, b)
    rands = None
    randomness = None
    if zk:
        r = fp.random_elements(curve.fr, rng, (3,))
        rands = r
        randomness = InputWitnessRandomness(r[0], r[1], r[2])
    comms = pedersen.commit_batched(curve, ck, jnp.stack([a, b, prod]), rands)
    cl = hp_as.common.unstack_affine(comms)
    return InstanceWitnessPair(InputInstance(cl[0], cl[1], cl[2]),
                               InputWitness(a, b, randomness))


def test_missing_rng_for_hiding_inputs(hp_setup, rng):
    """Reference src/hp_as/mod.rs:663-673: hiding inputs without rng error."""
    scheme, keys = hp_setup
    zk_input = _hp_input(PALLAS, keys[0], rng, zk=True)
    with pytest.raises(errors.MissingRng):
        scheme.prove(keys[0], [zk_input], [], MakeZK.Disabled())


def test_malformed_vector_length(hp_setup, rng):
    """Reference src/hp_as/mod.rs:143-154: unequal vector lengths error."""
    scheme, keys = hp_setup
    good = _hp_input(PALLAS, keys[0], rng)
    bad = _hp_input(PALLAS, keys[0], rng, n=VEC - 1)
    with pytest.raises(errors.MalformedInput):
        scheme.prove(keys[0], [good, bad], [], MakeZK.Disabled())


def test_verify_rejects_wrong_proof_structure(hp_setup, rng):
    """Reference src/hp_as/mod.rs:160-176: proof comm counts must match."""
    scheme, keys = hp_setup
    inputs = [_hp_input(PALLAS, keys[0], rng) for _ in range(2)]
    acc, proof = scheme.prove(keys[0], inputs, [], MakeZK.Disabled())
    # drop one low commitment
    from accumulation_tpu.curves import weierstrass as wst
    bad = hp_as.Proof(
        wst.Affine(proof.product_poly_comm_low.x[:0],
                   proof.product_poly_comm_low.y[:0],
                   proof.product_poly_comm_low.inf[:0]),
        proof.product_poly_comm_high, proof.hiding_comms)
    assert not scheme.verify(keys[1], [i.instance for i in inputs], [],
                             acc.instance, bad)


def test_ipa_as_rejects_invalid_input_proof(rng):
    """Reference src/ipa_pc_as/mod.rs:207-215: failed succinct check ->
    MalformedInput on prove, False on verify."""
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.schemes.ipa_pc_as import (
        AtomicASForInnerProductArgPC, InputInstance as IpaInstance,
        PredicateIndex)
    curve = PALLAS
    scheme = AtomicASForInnerProductArgPC(curve)
    pp = ipa_pc.setup(curve, 7)
    pk, vk, dk = scheme.index(None, pp, PredicateIndex(7, 7))
    coeffs = fp.random_elements(curve.fr, rng, (8,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, pk.ipa_ck, coeffs)
    proof = ipa_pc.open(curve, pk.ipa_ck, coeffs, comm, point)
    wrong_value = fp.random_elements(curve.fr, rng, ())
    bad_input = InstanceWitnessPair(
        IpaInstance(comm, point, wrong_value, proof), None)
    with pytest.raises(errors.MalformedInput):
        scheme.prove(pk, [bad_input], [], MakeZK.Disabled())
    # verify with any claimed accumulator also returns False
    good_value = poly_ops.evaluate(curve.fr, coeffs, point)
    good_input = InstanceWitnessPair(
        IpaInstance(comm, point, good_value, proof), None)
    acc, asproof = scheme.prove(pk, [good_input], [], MakeZK.Disabled())
    assert not scheme.verify(vk, [bad_input.instance], [], acc.instance,
                             asproof)


def test_nark_as_rejects_wrong_input_length(rng):
    """Reference src/r1cs_nark_as/mod.rs:127-142."""
    from test_r1cs_nark import DummyCircuit
    from accumulation_tpu.schemes.r1cs_nark import R1CSNark
    from accumulation_tpu.schemes.r1cs_nark_as import (ASForR1CSNark,
                                                       InputInstance)
    curve = PALLAS
    scheme = ASForR1CSNark(curve)
    nark = R1CSNark(curve)
    ipk, ivk = nark.index(DummyCircuit(num_variables=6, num_constraints=4))
    keys = scheme.index(None, None, (ipk, ivk))
    from accumulation_tpu.ops.sponge import PoseidonSponge, R1CS_NARK_DOMAIN
    p = curve.fr.modulus
    a, b = 3, 5
    circ = DummyCircuit(a, b, 6, 4)
    proof = nark.prove(ipk, circ,
                       sponge=PoseidonSponge(curve.fq).fork(R1CS_NARK_DOMAIN))
    bad_inst = InputInstance(
        fp.array_from_ints(curve.fr, [1, a * b % p, 0]),  # wrong length
        proof.first_msg)
    with pytest.raises(errors.MalformedInput):
        scheme.prove(keys[0], [InstanceWitnessPair(bad_inst, proof.second_msg)],
                     [], MakeZK.Disabled())


def test_ipa_as_rejects_missing_input_proof(rng):
    """An instance with no IPA opening proof must raise the typed
    MalformedInput (Rust's type system forbids the state at compile time;
    here it is a runtime structure check — ref mod.rs:114-134 analog)."""
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.schemes.ipa_pc_as import (
        AtomicASForInnerProductArgPC, InputInstance as IpaInstance,
        PredicateIndex)
    curve = PALLAS
    scheme = AtomicASForInnerProductArgPC(curve)
    pp = ipa_pc.setup(curve, 7)
    pk, vk, dk = scheme.index(None, pp, PredicateIndex(7, 7))
    coeffs = fp.random_elements(curve.fr, rng, (8,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, pk.ipa_ck, coeffs)
    no_proof = InstanceWitnessPair(
        IpaInstance(comm, point, fp.random_elements(curve.fr, rng, ()),
                    None), None)
    with pytest.raises(errors.MalformedInput):
        scheme.prove(pk, [no_proof], [], MakeZK.Disabled())
