"""IPA-PC round-trip tests (commit/open/check/succinct_check)."""

import jax.numpy as jnp
import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.ops import poly as poly_ops
from accumulation_tpu.pc import ipa_pc

DEGREE = 7  # n = 8, k = 3 rounds


@pytest.fixture(scope="module")
def ck():
    pp = ipa_pc.setup(PALLAS, DEGREE)
    return ipa_pc.trim(pp, DEGREE)


def test_open_check_roundtrip(ck, rng):
    curve = PALLAS
    coeffs = fp.random_elements(curve.fr, rng, (DEGREE + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs)
    proof = ipa_pc.open(curve, ck, coeffs, comm, point)
    value = poly_ops.evaluate(curve.fr, coeffs, point)
    assert ipa_pc.check(curve, ck, comm, point, value, proof)
    # succinct check alone also passes and returns the challenge poly
    res = ipa_pc.succinct_check(curve, ipa_pc.svk_of(ck), comm, point, value, proof)
    assert res is not None
    check_poly, final_key = res
    assert check_poly.challenges.shape[0] == 3
    # h coefficients committed under G give the final key
    hcoeffs = check_poly.compute_coeffs(curve.fr)
    expect = ipa_pc.commit(curve, ck, hcoeffs)
    assert bool(np.asarray(wst.affine_eq(expect, final_key)))


def test_wrong_value_rejected(ck, rng):
    curve = PALLAS
    coeffs = fp.random_elements(curve.fr, rng, (DEGREE + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs)
    proof = ipa_pc.open(curve, ck, coeffs, comm, point)
    bad_value = fp.add(curve.fr, poly_ops.evaluate(curve.fr, coeffs, point),
                       fp.from_int(curve.fr, 1))
    assert not ipa_pc.check(curve, ck, comm, point, bad_value, proof)


def test_hiding_roundtrip(ck, rng):
    curve = PALLAS
    coeffs = fp.random_elements(curve.fr, rng, (DEGREE + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    omega = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs, omega)
    proof = ipa_pc.open(curve, ck, coeffs, comm, point, rand=omega,
                        hiding=True, rng=rng)
    assert proof.hiding_comm is not None and proof.rand is not None
    value = poly_ops.evaluate(curve.fr, coeffs, point)
    assert ipa_pc.check(curve, ck, comm, point, value, proof)


def test_low_degree_poly(ck, rng):
    """Opening a polynomial shorter than the key (zero-padded)."""
    curve = PALLAS
    coeffs = fp.random_elements(curve.fr, rng, (3,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs)
    proof = ipa_pc.open(curve, ck, coeffs, comm, point)
    value = poly_ops.evaluate(curve.fr, coeffs, point)
    assert ipa_pc.check(curve, ck, comm, point, value, proof)


def test_default_zero_proof(ck):
    """The zero polynomial's default proof (reference ipa_pc_as index,
    mod.rs:515-534)."""
    curve = PALLAS
    coeffs = jnp.zeros((1, fp.NLIMBS), jnp.uint32)
    comm = wst.affine_zero(curve, ())
    point = jnp.zeros((fp.NLIMBS,), jnp.uint32)
    proof = ipa_pc.open(curve, ck, coeffs, comm, point)
    value = jnp.zeros((fp.NLIMBS,), jnp.uint32)
    assert ipa_pc.check(curve, ck, comm, point, value, proof)
