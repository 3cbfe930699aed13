"""Curve group-law tests vs a python-int affine model."""

import jax.numpy as jnp
import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp

C = PALLAS
P = C.fq.modulus


def py_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    (x1, y1), (x2, y2) = a, b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def py_mul(pt, k):
    acc = None
    for i in range(k.bit_length() - 1, -1, -1):
        acc = py_add(acc, acc)
        if (k >> i) & 1:
            acc = py_add(acc, pt)
    return acc


G = (C.gen_x % P, C.gen_y % P)


def _eq1(a, b):
    return bool(np.asarray(wst.affine_eq(a, b)))


def test_generator_on_curve():
    g = wst.generator(C)
    assert bool(np.asarray(wst.is_on_curve(C, g)))


def test_add_double_mixed_consistency():
    g = wst.generator(C)
    gj = wst.from_affine(C, g)
    g2 = wst.jac_double(C, gj)
    g3 = wst.proj_add(C, g2, gj)
    g3m = wst.proj_add_affine(C, g2, g)
    assert _eq1(wst.to_affine(C, g3), wst.to_affine(C, g3m))
    assert wst.affine_to_ints(C, wst.to_affine(C, g3))[0] == py_mul(G, 3)


def test_identity_and_inverse_cases():
    g = wst.generator(C)
    gj = wst.from_affine(C, g)
    inf = wst.projective_zero(C, ())
    assert bool(np.asarray(fp.is_zero(wst.proj_add(C, gj, wst.jac_neg(C, gj)).z)))
    assert _eq1(wst.to_affine(C, wst.proj_add(C, gj, inf)), g)
    assert _eq1(wst.to_affine(C, wst.proj_add(C, inf, gj)), g)
    assert bool(np.asarray(fp.is_zero(wst.jac_double(C, inf).z)))
    # mixed-add specials
    assert _eq1(wst.to_affine(C, wst.proj_add_affine(C, inf, g)), g)
    assert _eq1(wst.to_affine(C, wst.proj_add_affine(C, gj, wst.affine_zero(C, ()))), g)
    assert bool(np.asarray(fp.is_zero(
        wst.proj_add_affine(C, gj, wst.affine_neg(C, g)).z)))
    assert _eq1(wst.to_affine(C, wst.proj_add_affine(C, gj, g)),
                wst.to_affine(C, wst.jac_double(C, gj)))


def test_scalar_mul(rng):
    g = wst.generator(C)
    gj = wst.from_affine(C, g)
    k = int.from_bytes(rng.bytes(40), "little") % C.fr.modulus
    got = wst.affine_to_ints(
        C, wst.to_affine(C, wst.scalar_mul(C, gj, fp.from_int(C.fr, k))))[0]
    assert got == py_mul(G, k)


def test_msm_bitserial_and_lincomb(rng):
    n = 8
    ks = [int.from_bytes(rng.bytes(40), "little") % C.fr.modulus for _ in range(n)]
    base = [py_mul(G, i + 2) for i in range(n)]
    # an infinity point and a zero scalar in the mix
    base[6] = None
    ks[3] = 0
    pts = wst.affine_from_ints(C, base)
    sc = fp.array_from_ints(C.fr, ks)
    got = wst.affine_to_ints(C, wst.to_affine(C, wst.msm_bitserial(C, pts, sc)))[0]
    expect = None
    for pt, k in zip(base, ks):
        if pt is not None:
            expect = py_add(expect, py_mul(pt, k))
    assert got == expect
    got2 = wst.affine_to_ints(
        C, wst.to_affine(C, wst.lincomb(C, wst.from_affine(C, pts), sc)))[0]
    assert got2 == expect


def test_proj_eq():
    g = wst.generator(C)
    gj = wst.from_affine(C, g)
    two = fp.from_int(C.fq, 2)
    scaled = wst.Projective(
        fp.mul(C.fq, gj.x, two), fp.mul(C.fq, gj.y, two), fp.mul(C.fq, gj.z, two))
    assert bool(np.asarray(wst.proj_eq(C, gj, scaled)))
    assert not bool(np.asarray(wst.proj_eq(C, gj, wst.jac_double(C, gj))))
