"""BLS12-381 G1 instantiation — the beyond-255-bit field-layer test
(round-1 verdict next #9; SURVEY.md §7.1).

The 381-bit base field exercises the per-spec limb-count generalisation
(24 x 16-bit limbs, Montgomery R = 2^384); the scheme chain proves the whole
stack (field, curve, Pedersen, sponge, hp_as) is generic over CurveSpec.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import harness
from accumulation_tpu.core.accumulation import InstanceWitnessPair
from accumulation_tpu.curves import BLS12_381_G1, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.fields.bls12_381 import FQ381
from accumulation_tpu.pc import pedersen
from accumulation_tpu.schemes import hp_as
from accumulation_tpu.schemes.hp_as import (ASForHadamardProducts,
                                            InputInstance, InputWitness)

CURVE = BLS12_381_G1


def test_field_matches_python_ints(rng):
    p = FQ381.modulus
    xs = [int(rng.integers(0, 1 << 62)) ** 5 % p for _ in range(6)] + [0, 1, p - 1]
    a = fp.array_from_ints(FQ381, xs)
    b = fp.array_from_ints(FQ381, list(reversed(xs)))
    assert fp.array_to_ints(FQ381, fp.mul(FQ381, a, b)) == [
        x * y % p for x, y in zip(xs, reversed(xs))]
    assert fp.array_to_ints(FQ381, fp.inv(FQ381, a)) == [
        pow(x, -1, p) if x else 0 for x in xs]


def test_generator_on_curve():
    g = wst.generator(CURVE)
    assert bool(np.asarray(wst.is_on_curve(CURVE, g)))
    # 2G + G == 3G sanity through both add paths
    gp = wst.from_affine(CURVE, g)
    g2 = wst.jac_double(CURVE, gp)
    g3a = wst.proj_add(CURVE, g2, gp)
    g3b = wst.proj_add_affine(CURVE, g2, g)
    assert bool(np.asarray(wst.proj_eq(CURVE, g3a, g3b)))


def test_sampled_points_in_subgroup():
    """Hash-to-curve sampling must clear the ~2^126 G1 cofactor: r*P == O
    only holds on the prime-order subgroup (Pedersen's homomorphism, and
    hence every scheme, breaks otherwise — this is a regression test)."""
    pts = pedersen._sample_points(CURVE, 3, b"subgroup-check")
    r_times = wst.scalar_mul_int(
        CURVE, wst.from_affine(CURVE, pts), CURVE.fr.modulus)
    aff = wst.to_affine(CURVE, r_times)
    assert bool(np.asarray(jnp.all(aff.inf)))
    assert not bool(np.asarray(jnp.any(pts.inf)))


def test_small_msm_vs_python(rng):
    from accumulation_tpu.ops import msm as msm_mod
    n = 40  # below SMALL_N_THRESHOLD: bit-serial path
    pts = pedersen._sample_points(CURVE, n, b"bls-msm-test")
    scalars = fp.random_elements(CURVE.fr, rng, (n,))
    out = wst.to_affine(CURVE, msm_mod.msm(CURVE, pts, scalars))

    p = CURVE.fq.modulus

    def padd(P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        (x1, y1), (x2, y2) = P, Q
        if x1 == x2 and (y1 + y2) % p == 0:
            return None
        if P == Q:
            lam = 3 * x1 * x1 * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    def pmul(k, P):
        R = None
        while k:
            if k & 1:
                R = padd(R, P)
            P = padd(P, P)
            k >>= 1
        return R

    acc = None
    for s_i, pt in zip(fp.array_to_ints(CURVE.fr, scalars),
                       wst.affine_to_ints(CURVE, pts)):
        acc = padd(acc, pmul(s_i, pt))
    assert (fp.to_int(CURVE.fq, out.x), fp.to_int(CURVE.fq, out.y)) == acc


def test_hp_as_chain_over_bls(rng):
    """Full accumulate chain (prove -> verify -> decide) over BLS12-381."""
    curve = CURVE
    scheme = ASForHadamardProducts(curve)
    vec_len = 4
    keys = scheme.index(None, None, vec_len)

    def gen(n):
        out = []
        for _ in range(n):
            a = fp.random_elements(curve.fr, rng, (vec_len,))
            b = fp.random_elements(curve.fr, rng, (vec_len,))
            prod = hp_as.compute_hp(curve, a, b)
            comms = pedersen.commit_batched(
                curve, keys[0], jnp.stack([a, b, prod]))
            cl = hp_as.common.unstack_affine(comms)
            out.append(InstanceWitnessPair(
                InputInstance(cl[0], cl[1], cl[2]), InputWitness(a, b, None)))
        return out

    assert harness.test_template(
        scheme, keys, gen, harness.SIMPLE_ACCUMULATION, make_zk=False,
        rng=rng, num_iterations=1)
