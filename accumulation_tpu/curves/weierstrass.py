"""Batched short-Weierstrass curve arithmetic (layer L1, curve part).

TPU-native replacement for the `ark-ec` surface the reference consumes
(AffineCurve/ProjectiveCurve ops, `batch_normalization_into_affine`,
`G::mul`; e.g. reference src/hp_as/mod.rs:396-406,468-472).

Points are pytrees of limb tensors (see fields.fp).  Internal arithmetic uses
homogeneous projective coordinates with the *complete* addition formulas of
Renes-Costello-Batina 2015 (algorithms 7-9, a = 0): a single branch-free
code path covers doubling, inverses and the identity (0 : 1 : 0), which is
exactly what a TPU wants — no `where` cascades, no data-dependent control
flow, and roughly half the field-multiplications of a guarded Projective
implementation.  An affine point carries an explicit `inf` flag (used only at
the API boundary and for mixed addition's one select).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE, FieldSpec


class Affine(NamedTuple):
    x: jnp.ndarray  # (..., NLIMBS) Montgomery
    y: jnp.ndarray
    inf: jnp.ndarray  # (...) bool


class Projective(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray  # (0 : 1 : 0) is the identity


@dataclass(frozen=True, eq=False)
class CurveSpec:
    """y^2 = x^3 + b over fq, scalar field fr, a = 0."""

    name: str
    fq: FieldSpec
    fr: FieldSpec
    b: int
    gen_x: int
    gen_y: int
    # |E(Fq)| = cofactor * fr.modulus.  Hash-to-curve sampling must multiply
    # by the cofactor to land in the prime-order subgroup (BLS12-381 G1 has
    # h ~ 2^126; the Pasta curves have h = 1).
    cofactor: int = 1
    b_mont: np.ndarray = field(default=None, repr=False)
    b3_mont: np.ndarray = field(default=None, repr=False)  # 3*b


@functools.lru_cache(maxsize=None)
def make_curve(name, fq, fr, b, gen_x, gen_y, cofactor=1) -> CurveSpec:
    r = fq.r_mod_p
    q = fq.modulus
    return CurveSpec(
        name=name, fq=fq, fr=fr, b=b, gen_x=gen_x, gen_y=gen_y,
        cofactor=cofactor,
        b_mont=np.asarray(fp.int_to_limbs((b % q) * r % q, fq.nlimbs)),
        b3_mont=np.asarray(fp.int_to_limbs((3 * b % q) * r % q, fq.nlimbs)),
    )


def _cjit(fn):
    return jax.jit(fn, static_argnums=0)


# ---------------------------------------------------------------------------
# Constructors / conversions
# ---------------------------------------------------------------------------


def affine_zero(curve: CurveSpec, shape=()) -> Affine:
    z = jnp.zeros(shape + (curve.fq.nlimbs,), DTYPE)
    return Affine(z, z, jnp.ones(shape, bool))


def projective_zero(curve: CurveSpec, shape=()) -> Projective:
    """The identity (0 : 1 : 0), batched."""
    nl = curve.fq.nlimbs
    z = jnp.zeros(shape + (nl,), DTYPE)
    one = jnp.broadcast_to(jnp.asarray(curve.fq.one_mont, DTYPE), shape + (nl,))
    return Projective(z, one, jnp.zeros(shape + (nl,), DTYPE))


def generator(curve: CurveSpec) -> Affine:
    q = curve.fq.modulus
    x = fp.from_int(curve.fq, curve.gen_x % q)
    y = fp.from_int(curve.fq, curve.gen_y % q)
    return Affine(x, y, jnp.zeros((), bool))


def affine_from_ints(curve: CurveSpec, pts) -> Affine:
    """[(x, y) or None] -> batched Affine (None = infinity)."""
    n = len(pts)
    nl = curve.fq.nlimbs
    xs = np.zeros((n, nl), np.uint32)
    ys = np.zeros((n, nl), np.uint32)
    inf = np.zeros((n,), bool)
    for i, pt in enumerate(pts):
        if pt is None:
            inf[i] = True
        else:
            xs[i] = fp.int_to_limbs(pt[0] % curve.fq.modulus, nl)
            ys[i] = fp.int_to_limbs(pt[1] % curve.fq.modulus, nl)
    return Affine(
        fp.to_mont(curve.fq, jnp.asarray(xs)),
        fp.to_mont(curve.fq, jnp.asarray(ys)),
        jnp.asarray(inf),
    )


def affine_to_ints(curve: CurveSpec, pt: Affine):
    """Batched affine -> list of (x, y) or None."""
    xs = fp.array_to_ints(curve.fq, pt.x)
    ys = fp.array_to_ints(curve.fq, pt.y)
    infs = np.asarray(pt.inf).reshape(-1)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


@_cjit
def from_affine(curve: CurveSpec, p: Affine) -> Projective:
    one = jnp.broadcast_to(jnp.asarray(curve.fq.one_mont, DTYPE), p.x.shape)
    z = jnp.where(p.inf[..., None], jnp.zeros_like(one), one)
    y = jnp.where(p.inf[..., None], one, p.y)
    x = jnp.where(p.inf[..., None], jnp.zeros_like(p.x), p.x)
    return Projective(x, y, z)


@_cjit
def to_affine(curve: CurveSpec, p: Projective) -> Affine:
    """Batch normalisation (mirrors `batch_normalization_into_affine`,
    reference src/hp_as/mod.rs:468): one batched inversion for all points."""
    f = curve.fq
    shape = p.z.shape[:-1]
    nl = p.z.shape[-1]
    z_flat = p.z.reshape((-1, nl)) if shape else p.z.reshape((1, nl))
    zinv = fp.batch_inverse(f, z_flat).reshape(p.z.shape)
    x = fp.mul(f, p.x, zinv)
    y = fp.mul(f, p.y, zinv)
    inf = fp.is_zero(p.z)
    x = jnp.where(inf[..., None], jnp.zeros_like(x), x)
    y = jnp.where(inf[..., None], jnp.zeros_like(y), y)
    return Affine(x, y, inf)


def affine_eq(p: Affine, q: Affine):
    both_inf = p.inf & q.inf
    xy = fp.eq(p.x, q.x) & fp.eq(p.y, q.y) & ~p.inf & ~q.inf
    return both_inf | xy


@_cjit
def proj_eq(curve: CurveSpec, p: Projective, q: Projective):
    """Projective equality by cross-multiplication (no inversion)."""
    f = curve.fq
    p_inf = fp.is_zero(p.z)
    q_inf = fp.is_zero(q.z)
    x_eq = fp.eq(fp.mul(f, p.x, q.z), fp.mul(f, q.x, p.z))
    y_eq = fp.eq(fp.mul(f, p.y, q.z), fp.mul(f, q.y, p.z))
    return (p_inf & q_inf) | (~p_inf & ~q_inf & x_eq & y_eq)


@_cjit
def is_on_curve(curve: CurveSpec, p: Affine):
    f = curve.fq
    lhs = fp.square(f, p.y)
    rhs = fp.add(
        f,
        fp.mul(f, fp.square(f, p.x), p.x),
        jnp.broadcast_to(jnp.asarray(curve.b_mont, DTYPE), p.x.shape),
    )
    return fp.eq(lhs, rhs) | p.inf


# ---------------------------------------------------------------------------
# Complete group law (RCB15, a = 0)
# ---------------------------------------------------------------------------


def _add_raw(curve: CurveSpec, p: Projective, q: Projective) -> Projective:
    """RCB15 algorithm 7: complete projective addition, 12M + 2 const-mul."""
    f = curve.fq
    b3 = jnp.asarray(curve.b3_mont, DTYPE)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = fp.mul(f, X1, X2)
    t1 = fp.mul(f, Y1, Y2)
    t2 = fp.mul(f, Z1, Z2)
    t3 = fp.mul(f, fp.add(f, X1, Y1), fp.add(f, X2, Y2))
    t3 = fp.sub(f, t3, fp.add(f, t0, t1))          # X1Y2 + X2Y1
    t4 = fp.mul(f, fp.add(f, Y1, Z1), fp.add(f, Y2, Z2))
    t4 = fp.sub(f, t4, fp.add(f, t1, t2))          # Y1Z2 + Y2Z1
    X3 = fp.mul(f, fp.add(f, X1, Z1), fp.add(f, X2, Z2))
    Y3 = fp.sub(f, X3, fp.add(f, t0, t2))          # X1Z2 + X2Z1
    t0 = fp.add(f, fp.add(f, t0, t0), t0)          # 3 X1X2
    t2 = fp.mul(f, b3, t2)                         # b3 Z1Z2
    Z3 = fp.add(f, t1, t2)
    t1 = fp.sub(f, t1, t2)
    Y3 = fp.mul(f, b3, Y3)                         # b3 (X1Z2 + X2Z1)
    X3 = fp.mul(f, t4, Y3)
    X3 = fp.sub(f, fp.mul(f, t3, t1), X3)
    Y3 = fp.mul(f, Y3, t0)
    Y3 = fp.add(f, fp.mul(f, t1, Z3), Y3)
    t0 = fp.mul(f, t0, t3)
    Z3 = fp.add(f, fp.mul(f, Z3, t4), t0)
    return Projective(X3, Y3, Z3)


def _add_mixed_raw(curve: CurveSpec, p: Projective, q: Affine) -> Projective:
    """RCB15 algorithm 8 (Z2 = 1) + one select for q = infinity."""
    f = curve.fq
    b3 = jnp.asarray(curve.b3_mont, DTYPE)
    X1, Y1, Z1 = p
    X2, Y2 = q.x, q.y
    t0 = fp.mul(f, X1, X2)
    t1 = fp.mul(f, Y1, Y2)
    t3 = fp.mul(f, fp.add(f, X2, Y2), fp.add(f, X1, Y1))
    t3 = fp.sub(f, t3, fp.add(f, t0, t1))          # X1Y2 + X2Y1
    t4 = fp.add(f, fp.mul(f, Y2, Z1), Y1)          # Y1 + Y2Z1
    Y3 = fp.add(f, fp.mul(f, X2, Z1), X1)          # X1 + X2Z1
    t0 = fp.add(f, fp.add(f, t0, t0), t0)          # 3 X1X2
    t2 = fp.mul(f, b3, Z1)
    Z3 = fp.add(f, t1, t2)
    t1 = fp.sub(f, t1, t2)
    Y3 = fp.mul(f, b3, Y3)
    X3 = fp.mul(f, t4, Y3)
    X3 = fp.sub(f, fp.mul(f, t3, t1), X3)
    Y3 = fp.mul(f, Y3, t0)
    Y3 = fp.add(f, fp.mul(f, t1, Z3), Y3)
    t0 = fp.mul(f, t0, t3)
    Z3 = fp.add(f, fp.mul(f, Z3, t4), t0)
    out = Projective(X3, Y3, Z3)
    qinf = q.inf[..., None]
    return Projective(
        jnp.where(qinf, jnp.broadcast_to(p.x, out.x.shape), out.x),
        jnp.where(qinf, jnp.broadcast_to(p.y, out.y.shape), out.y),
        jnp.where(qinf, jnp.broadcast_to(p.z, out.z.shape), out.z),
    )


def _dbl_raw(curve: CurveSpec, p: Projective) -> Projective:
    """RCB15 algorithm 9: complete doubling, 6M + 2S + 1 const-mul."""
    f = curve.fq
    b3 = jnp.asarray(curve.b3_mont, DTYPE)
    X, Y, Z = p
    t0 = fp.square(f, Y)
    Z3 = fp.add(f, t0, t0)
    Z3 = fp.add(f, Z3, Z3)
    Z3 = fp.add(f, Z3, Z3)                          # 8 Y^2
    t1 = fp.mul(f, Y, Z)
    t2 = fp.mul(f, b3, fp.square(f, Z))
    X3 = fp.mul(f, t2, Z3)
    Y3 = fp.add(f, t0, t2)
    Z3 = fp.mul(f, t1, Z3)
    t1 = fp.add(f, t2, t2)
    t2 = fp.add(f, t1, t2)
    t0 = fp.sub(f, t0, t2)
    Y3 = fp.mul(f, t0, Y3)
    Y3 = fp.add(f, X3, Y3)
    t1 = fp.mul(f, X, Y)
    X3 = fp.mul(f, t0, t1)
    X3 = fp.add(f, X3, X3)
    return Projective(X3, Y3, Z3)


proj_add = _cjit(_add_raw)
proj_add_affine = _cjit(_add_mixed_raw)
jac_double = _cjit(_dbl_raw)


@_cjit
def jac_neg(curve: CurveSpec, p: Projective) -> Projective:
    return Projective(p.x, fp.neg(curve.fq, p.y), p.z)


def affine_neg(curve: CurveSpec, p: Affine) -> Affine:
    return Affine(p.x, fp.neg(curve.fq, p.y), p.inf)


def _where_pt(cond, a: Projective, b: Projective) -> Projective:
    c = cond[..., None]
    return Projective(
        jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z)
    )


# ---------------------------------------------------------------------------
# Scalar multiplication and small-N MSM
# ---------------------------------------------------------------------------


@_cjit
def scalar_mul(curve: CurveSpec, p: Projective, scalar_mont) -> Projective:
    """Double-and-add over the 256 canonical scalar bits (batched)."""
    bits = fp.canonical_bits(curve.fr, scalar_mont)  # (..., 256)
    nbits = bits.shape[-1]

    def body(acc, i):
        acc = _dbl_raw(curve, acc)
        bit = bits[..., nbits - 1 - i]
        added = _add_raw(curve, acc, p)
        acc = _where_pt(bit == 1, added, acc)
        return acc, None

    init = projective_zero(curve, p.z.shape[:-1])
    acc, _ = jax.lax.scan(body, init, jnp.arange(nbits))
    return acc


def scalar_mul_int(curve: CurveSpec, p: Projective, k: int) -> Projective:
    """Multiply by a fixed (static) python integer, batched double-and-add.

    Used for cofactor clearing after hash-to-curve sampling (k = the curve's
    cofactor, an integer NOT reduced mod fr)."""
    if k == 0:
        return projective_zero(curve, p.z.shape[:-1])
    bits = jnp.asarray([int(b) for b in bin(k)[2:]], jnp.uint32)

    def body(acc, bit):
        acc = _dbl_raw(curve, acc)
        added = _add_raw(curve, acc, p)
        return _where_pt(bit == 1, added, acc), None

    acc, _ = jax.lax.scan(body, projective_zero(curve, p.z.shape[:-1]), bits)
    return acc


def _tree_reduce(curve: CurveSpec, pts: Projective) -> Projective:
    """Sum points over the leading axis with a log-depth add tree."""
    n = pts.z.shape[0]
    if n == 0:
        return projective_zero(curve, pts.z.shape[1:-1])
    m = 1 << (n - 1).bit_length()
    if m != n:
        pad = projective_zero(curve, (m - n,) + pts.z.shape[1:-1])
        pts = Projective(*(jnp.concatenate([a, b], 0) for a, b in zip(pts, pad)))
    while m > 1:
        half = m // 2
        left = Projective(*(a[:half] for a in pts))
        right = Projective(*(a[half:] for a in pts))
        pts = _add_raw(curve, left, right)
        m = half
    return Projective(pts.x[0], pts.y[0], pts.z[0])


@_cjit
def msm_bitserial(curve: CurveSpec, points: Affine, scalars_mont) -> Projective:
    """MSM for small N: bit-serial double-and-add with a masked tree sum."""
    bits = fp.canonical_bits(curve.fr, scalars_mont)  # (N, 256)
    nbits = bits.shape[-1]
    pts = from_affine(curve, points)

    def body(acc, i):
        acc = _dbl_raw(curve, acc)
        mask = bits[:, nbits - 1 - i] == 1
        sel = _where_pt(mask, pts, projective_zero(curve, (bits.shape[0],)))
        acc = _add_raw(curve, acc, _tree_reduce(curve, sel))
        return acc, None

    acc, _ = jax.lax.scan(body, projective_zero(curve, ()), jnp.arange(nbits))
    return acc


@_cjit
def lincomb(curve: CurveSpec, points: Projective, scalars_mont) -> Projective:
    """Linear combination of a few projective points (batched bit-serial);
    verifier-side commitment combines (reference hp_as/mod.rs:391-406)."""
    bits = fp.canonical_bits(curve.fr, scalars_mont)
    nbits = bits.shape[-1]

    def body(acc, i):
        acc = _dbl_raw(curve, acc)
        mask = bits[:, nbits - 1 - i] == 1
        sel = _where_pt(mask, points, projective_zero(curve, (bits.shape[0],)))
        acc = _add_raw(curve, acc, _tree_reduce(curve, sel))
        return acc, None

    acc, _ = jax.lax.scan(body, projective_zero(curve, ()), jnp.arange(nbits))
    return acc
