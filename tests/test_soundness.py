"""Soundness regression tests for the gadget substrate hardening.

Round-2 fixes (VERDICT missing #2, ADVICE high/medium/low):
  * canonical point allocation rejects the absorbing (0:0:0) witness point
    that previously satisfied every verifier-gadget relation vacuously;
  * bit_decompose's canonical < p comparison rejects the (x + p) bit
    decomposition that previously let a prover pick between two Fiat-Shamir
    challenge values per squeeze;
  * msm() rejects window sizes that would silently drop top scalar bits;
  * ipa_pc.succinct_check rejects proofs whose round count doesn't match the
    committer-key length (degree-bound enforcement).
"""

import numpy as np
import pytest

from accumulation_tpu.constraints import gadgets, r1cs
from accumulation_tpu.constraints.gadgets import (BoolVar, FpVar, GadgetCS,
                                                  PointVar)
from accumulation_tpu.constraints.hp_as_gadget import _alloc_point
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp


def _fresh_g():
    return GadgetCS(PALLAS.fq)


# ---------------------------------------------------------------------------
# point allocation canonicity
# ---------------------------------------------------------------------------


def test_honest_point_allocation_satisfied():
    g = _fresh_g()
    _alloc_point(g, PALLAS, (PALLAS.gen_x, PALLAS.gen_y))
    _alloc_point(g, PALLAS, None)  # identity
    g.finalize()
    assert g.cs.is_satisfied()


def test_zero_point_allocation_rejected():
    """(0:0:0) must violate the canonical-identity constraints."""
    g = _fresh_g()
    pt = PointVar(FpVar.witness(g, 0), FpVar.witness(g, 0),
                  FpVar.witness(g, 0))
    gadgets.enforce_point_canonical(g, pt, PALLAS.b)
    g.finalize()
    assert not g.cs.is_satisfied()


def test_off_curve_point_rejected():
    g = _fresh_g()
    pt = PointVar(FpVar.witness(g, PALLAS.gen_x),
                  FpVar.witness(g, (PALLAS.gen_y + 1) % PALLAS.fq.modulus),
                  FpVar.witness(g, 1))
    gadgets.enforce_point_canonical(g, pt, PALLAS.b)
    g.finalize()
    assert not g.cs.is_satisfied()


def test_noncanonical_identity_rejected():
    """z=0 must force exactly (0:1:0): (0:5:0) is rejected."""
    g = _fresh_g()
    pt = PointVar(FpVar.witness(g, 0), FpVar.witness(g, 5),
                  FpVar.witness(g, 0))
    gadgets.enforce_point_canonical(g, pt, PALLAS.b)
    g.finalize()
    assert not g.cs.is_satisfied()


def test_zero_point_equality_attack_rejected():
    """The advisor's attack: add((0:0:0), G) enforced equal to G used to be
    satisfiable because (0:0:0) is absorbing under RCB15 and vacuous under
    cross-multiplication equality.  With canonical allocation the witness
    assignment itself violates the allocation constraints."""
    g = _fresh_g()
    b3 = 3 * PALLAS.b
    zero_pt = PointVar(FpVar.witness(g, 0), FpVar.witness(g, 0),
                       FpVar.witness(g, 0))
    gadgets.enforce_point_canonical(g, zero_pt, PALLAS.b)
    gen = _alloc_point(g, PALLAS, (PALLAS.gen_x, PALLAS.gen_y), public=True)
    s = gadgets.point_add(g, zero_pt, gen, b3)
    gadgets.point_enforce_equal(g, s, gen)
    g.finalize()
    assert not g.cs.is_satisfied()


# ---------------------------------------------------------------------------
# bit decomposition canonicity
# ---------------------------------------------------------------------------


def test_bit_decompose_honest_satisfied(rng):
    g = _fresh_g()
    p = g.p
    for val in [0, 1, p - 1, int(rng.integers(0, 2**63)) * 3]:
        x = FpVar.witness(g, val % p)
        gadgets.bit_decompose(g, x)
    g.finalize()
    assert g.cs.is_satisfied()


def _manual_bits(g, intval, nbits=255):
    return [BoolVar.witness(g, (intval >> i) & 1) for i in range(nbits)]


def test_noncanonical_x_plus_p_rejected():
    """Bits of (x + p) still sum to x mod p, but must fail the < p check."""
    g = _fresh_g()
    p = g.p
    x_val = 12345
    x = FpVar.witness(g, x_val)
    bits = _manual_bits(g, x_val + p)
    # the modular sum constraint alone is satisfied by the bad bits...
    acc = FpVar.constant(g, 0)
    for i, b in enumerate(bits):
        acc = acc + b.var.scale(pow(2, i, p))
    acc.enforce_equal(x)
    g.finalize()
    assert g.cs.is_satisfied(), "sanity: modular sum admits x+p"
    # ...but the canonical comparison rejects them.
    gadgets.enforce_bits_lt_constant(g, bits, p)
    g.finalize()
    assert not g.cs.is_satisfied()


def test_bits_equal_to_p_rejected():
    g = _fresh_g()
    bits = _manual_bits(g, g.p)
    gadgets.enforce_bits_lt_constant(g, bits, g.p)
    g.finalize()
    assert not g.cs.is_satisfied()


def test_bits_lt_boundary_cases():
    g = _fresh_g()
    for v in [0, 1, g.p - 1]:
        bits = _manual_bits(g, v)
        gadgets.enforce_bits_lt_constant(g, bits, g.p)
    g.finalize()
    assert g.cs.is_satisfied()


# ---------------------------------------------------------------------------
# msm window validation / ipa proof-shape validation
# ---------------------------------------------------------------------------


def test_msm_rejects_non_divisor_window(rng):
    from accumulation_tpu.curves import weierstrass as wst
    from accumulation_tpu.ops import msm as msm_mod

    n = 128
    scalars = fp.random_elements(PALLAS.fr, rng, (n,))
    base = wst.generator(PALLAS)
    pts = wst.affine_repeat(base, n) if hasattr(wst, "affine_repeat") else None
    if pts is None:
        from accumulation_tpu.curves.weierstrass import Affine
        import jax.numpy as jnp
        pts = Affine(jnp.broadcast_to(base.x, (n,) + base.x.shape),
                     jnp.broadcast_to(base.y, (n,) + base.y.shape),
                     jnp.broadcast_to(base.inf, (n,)))
    with pytest.raises(ValueError):
        msm_mod.msm(PALLAS, pts, scalars, c=6)


def test_succinct_check_rejects_short_proof(rng):
    from accumulation_tpu.curves.weierstrass import Affine
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc

    curve = PALLAS
    degree = 7
    pp = ipa_pc.setup(curve, degree)
    ck = ipa_pc.trim(pp, degree)
    coeffs = fp.random_elements(curve.fr, rng, (degree + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs)
    proof = ipa_pc.open(curve, ck, coeffs, comm, point)
    value = poly_ops.evaluate(curve.fr, coeffs, point)
    svk = ipa_pc.svk_of(ck)
    assert ipa_pc.succinct_check(curve, svk, comm, point, value, proof) is not None
    short = ipa_pc.Proof(
        l_vec=Affine(proof.l_vec.x[:-1], proof.l_vec.y[:-1],
                     proof.l_vec.inf[:-1]),
        r_vec=Affine(proof.r_vec.x[:-1], proof.r_vec.y[:-1],
                     proof.r_vec.inf[:-1]),
        final_comm_key=proof.final_comm_key,
        c=proof.c, hiding_comm=proof.hiding_comm, rand=proof.rand)
    assert ipa_pc.succinct_check(curve, svk, comm, point, value, short) is None
