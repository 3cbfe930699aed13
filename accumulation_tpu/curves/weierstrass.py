"""Batched short-Weierstrass curve arithmetic (layer L1, curve part).

TPU-native replacement for the `ark-ec` surface the reference consumes
(AffineCurve/ProjectiveCurve ops, `batch_normalization_into_affine`,
`G::mul`; e.g. reference src/hp_as/mod.rs:396-406,468-472).

Points are pytrees of limb tensors (see fields.fp): an affine point is
``(x, y, inf)`` with ``x, y: (..., NLIMBS) uint32`` Montgomery-form and
``inf: (...) bool``; a Jacobian point is ``(x, y, z)`` with the convention
``z == 0  <=>  infinity``.  All group ops are branchless: special cases
(infinity / equal-x doubling / inverses) are resolved with `jnp.where`
selects so the same traced program covers every input — the idiomatic way to
keep XLA shapes static and the VPU busy.

Formulas: dbl-2009-l and add-2007-bl / madd-2007-bl (a = 0 curves).
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


class Jacobian(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray  # z == 0 <=> infinity


@dataclass(frozen=True, eq=False)
class CurveSpec:
    """y^2 = x^3 + b over fq, scalar field fr, a = 0."""

    name: str
    fq: FieldSpec
    fr: FieldSpec
    b: int
    gen_x: int
    gen_y: int
    b_mont: np.ndarray = field(default=None, repr=False)


@functools.lru_cache(maxsize=None)
def make_curve(name, fq, fr, b, gen_x, gen_y) -> CurveSpec:
    return CurveSpec(
        name=name, fq=fq, fr=fr, b=b, gen_x=gen_x, gen_y=gen_y,
        b_mont=np.asarray(fp.int_to_limbs((b * fq.r_mod_p) % fq.modulus)),
    )


def _cjit(fn):
    return jax.jit(fn, static_argnums=0)


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------


def affine_zero(curve: CurveSpec, shape=()) -> Affine:
    z = jnp.zeros(shape + (NLIMBS,), DTYPE)
    return Affine(z, z, jnp.ones(shape, bool))


def jacobian_zero(curve: CurveSpec, shape=()) -> Jacobian:
    z = jnp.zeros(shape + (NLIMBS,), DTYPE)
    one = jnp.broadcast_to(jnp.asarray(curve.fq.one_mont, DTYPE), shape + (NLIMBS,))
    return Jacobian(one, one, z)


def generator(curve: CurveSpec) -> Affine:
    q = curve.fq.modulus
    x = fp.from_int(curve.fq, curve.gen_x % q)
    y = fp.from_int(curve.fq, curve.gen_y % q)
    return Affine(x, y, jnp.zeros((), bool))


def affine_from_ints(curve: CurveSpec, pts) -> Affine:
    """[(x, y) or None] -> batched Affine (None = infinity)."""
    n = len(pts)
    xs = np.zeros((n, NLIMBS), np.uint32)
    ys = np.zeros((n, NLIMBS), np.uint32)
    inf = np.zeros((n,), bool)
    for i, pt in enumerate(pts):
        if pt is None:
            inf[i] = True
        else:
            xs[i] = fp.int_to_limbs(pt[0] % curve.fq.modulus)
            ys[i] = fp.int_to_limbs(pt[1] % curve.fq.modulus)
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


# ---------------------------------------------------------------------------
# Core group law (branchless)
# ---------------------------------------------------------------------------


def _dbl_raw(curve: CurveSpec, p: Jacobian) -> Jacobian:
    f = curve.fq
    A = fp.square(f, p.x)
    B = fp.square(f, p.y)
    C = fp.square(f, B)
    t = fp.sub(f, fp.sub(f, fp.square(f, fp.add(f, p.x, B)), A), C)
    D = fp.add(f, t, t)  # 2*((X+B)^2 - A - C)
    E = fp.add(f, fp.add(f, A, A), A)
    F = fp.square(f, E)
    X3 = fp.sub(f, F, fp.add(f, D, D))
    eight_c = fp.add(f, C, C)
    eight_c = fp.add(f, eight_c, eight_c)
    eight_c = fp.add(f, eight_c, eight_c)
    Y3 = fp.sub(f, fp.mul(f, E, fp.sub(f, D, X3)), eight_c)
    yz = fp.mul(f, p.y, p.z)
    Z3 = fp.add(f, yz, yz)
    return Jacobian(X3, Y3, Z3)


@_cjit
def jac_double(curve: CurveSpec, p: Jacobian) -> Jacobian:
    return _dbl_raw(curve, p)


def _where_pt(cond, a: Jacobian, b: Jacobian) -> Jacobian:
    c = cond[..., None]
    return Jacobian(
        jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z)
    )


@_cjit
def jac_add(curve: CurveSpec, p: Jacobian, q: Jacobian) -> Jacobian:
    f = curve.fq
    Z1Z1 = fp.square(f, p.z)
    Z2Z2 = fp.square(f, q.z)
    U1 = fp.mul(f, p.x, Z2Z2)
    U2 = fp.mul(f, q.x, Z1Z1)
    S1 = fp.mul(f, fp.mul(f, p.y, q.z), Z2Z2)
    S2 = fp.mul(f, fp.mul(f, q.y, p.z), Z1Z1)
    H = fp.sub(f, U2, U1)
    two_h = fp.add(f, H, H)
    I = fp.square(f, two_h)
    J = fp.mul(f, H, I)
    r = fp.sub(f, S2, S1)
    r = fp.add(f, r, r)
    V = fp.mul(f, U1, I)
    X3 = fp.sub(f, fp.sub(f, fp.square(f, r), J), fp.add(f, V, V))
    s1j = fp.mul(f, S1, J)
    Y3 = fp.sub(f, fp.mul(f, r, fp.sub(f, V, X3)), fp.add(f, s1j, s1j))
    zsum = fp.add(f, p.z, q.z)
    Z3 = fp.mul(f, fp.sub(f, fp.sub(f, fp.square(f, zsum), Z1Z1), Z2Z2), H)
    out = Jacobian(X3, Y3, Z3)

    p_inf = fp.is_zero(p.z)
    q_inf = fp.is_zero(q.z)
    same_x = fp.is_zero(H) & ~p_inf & ~q_inf
    same_y = fp.is_zero(r)
    dbl = _dbl_raw(curve, p)
    inf = jacobian_zero(curve, np.broadcast_shapes(p.z.shape[:-1], q.z.shape[:-1]))
    out = _where_pt(same_x & same_y, dbl, out)
    out = _where_pt(same_x & ~same_y, inf, out)
    out = _where_pt(q_inf, p, out)
    out = _where_pt(p_inf, q, out)
    return out


@_cjit
def jac_add_affine(curve: CurveSpec, p: Jacobian, q: Affine) -> Jacobian:
    """Mixed addition (madd-2007-bl), branchless."""
    f = curve.fq
    Z1Z1 = fp.square(f, p.z)
    U2 = fp.mul(f, q.x, Z1Z1)
    S2 = fp.mul(f, fp.mul(f, q.y, p.z), Z1Z1)
    H = fp.sub(f, U2, p.x)
    HH = fp.square(f, H)
    I = fp.add(f, HH, HH)
    I = fp.add(f, I, I)
    J = fp.mul(f, H, I)
    r = fp.sub(f, S2, p.y)
    r = fp.add(f, r, r)
    V = fp.mul(f, p.x, I)
    X3 = fp.sub(f, fp.sub(f, fp.square(f, r), J), fp.add(f, V, V))
    yj = fp.mul(f, p.y, J)
    Y3 = fp.sub(f, fp.mul(f, r, fp.sub(f, V, X3)), fp.add(f, yj, yj))
    Z3 = fp.sub(f, fp.sub(f, fp.square(f, fp.add(f, p.z, H)), Z1Z1), HH)
    out = Jacobian(X3, Y3, Z3)

    p_inf = fp.is_zero(p.z)
    q_inf = q.inf
    q_jac = Jacobian(
        q.x, q.y,
        jnp.broadcast_to(jnp.asarray(curve.fq.one_mont, DTYPE), q.x.shape),
    )
    same_x = fp.is_zero(H) & ~p_inf & ~q_inf
    same_y = fp.is_zero(r)
    dbl = _dbl_raw(curve, p)
    inf = jacobian_zero(curve, np.broadcast_shapes(p.z.shape[:-1], q.x.shape[:-1]))
    out = _where_pt(same_x & same_y, dbl, out)
    out = _where_pt(same_x & ~same_y, inf, out)
    out = _where_pt(q_inf, p, out)
    out = _where_pt(p_inf & ~q_inf, q_jac, out)
    return out


@_cjit
def jac_neg(curve: CurveSpec, p: Jacobian) -> Jacobian:
    return Jacobian(p.x, fp.neg(curve.fq, p.y), p.z)


def affine_neg(curve: CurveSpec, p: Affine) -> Affine:
    return Affine(p.x, fp.neg(curve.fq, p.y), p.inf)


@_cjit
def from_affine(curve: CurveSpec, p: Affine) -> Jacobian:
    one = jnp.broadcast_to(jnp.asarray(curve.fq.one_mont, DTYPE), p.x.shape)
    z = jnp.where(p.inf[..., None], jnp.zeros_like(one), one)
    return Jacobian(p.x, p.y, z)


@_cjit
def to_affine(curve: CurveSpec, p: Jacobian) -> Affine:
    """Batch normalisation (mirrors `batch_normalization_into_affine`).

    Uses one batched inversion over all leading dims (Montgomery's trick via
    log-depth scans in fp.batch_inverse).
    """
    f = curve.fq
    shape = p.z.shape[:-1]
    z_flat = p.z.reshape((-1, NLIMBS)) if shape else p.z.reshape((1, NLIMBS))
    zinv = fp.batch_inverse(f, z_flat).reshape(p.z.shape)
    zinv2 = fp.square(f, zinv)
    zinv3 = fp.mul(f, zinv2, zinv)
    x = fp.mul(f, p.x, zinv2)
    y = fp.mul(f, p.y, zinv3)
    inf = fp.is_zero(p.z)
    x = jnp.where(inf[..., None], jnp.zeros_like(x), x)
    y = jnp.where(inf[..., None], jnp.zeros_like(y), y)
    return Affine(x, y, inf)


def affine_eq(p: Affine, q: Affine):
    both_inf = p.inf & q.inf
    xy = fp.eq(p.x, q.x) & fp.eq(p.y, q.y) & ~p.inf & ~q.inf
    return both_inf | xy


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
# Scalar multiplication and MSM
# ---------------------------------------------------------------------------


@_cjit
def scalar_mul(curve: CurveSpec, p: Jacobian, scalar_mont) -> Jacobian:
    """Double-and-add over the 256 canonical scalar bits (batched).

    p: (..., ) Jacobian; scalar_mont: (..., NLIMBS) Montgomery Fr elements.
    """
    bits = fp.canonical_bits(curve.fr, scalar_mont)  # (..., 256)
    nbits = bits.shape[-1]

    def body(acc, i):
        acc = _dbl_raw(curve, acc)
        bit = bits[..., nbits - 1 - i]
        added = jac_add(curve, acc, p)
        acc = _where_pt(bit == 1, added, acc)
        return acc, None

    init = jacobian_zero(curve, p.z.shape[:-1])
    acc, _ = jax.lax.scan(body, init, jnp.arange(nbits))
    return acc


def _tree_reduce(curve: CurveSpec, pts: Jacobian) -> Jacobian:
    """Sum points over the leading axis with a log-depth add tree."""
    n = pts.z.shape[0]
    # pad to power of two with infinity
    m = 1 if n == 0 else 1 << (n - 1).bit_length()
    if n == 0:
        return jacobian_zero(curve, pts.z.shape[1:-1])
    if m != n:
        pad = jacobian_zero(curve, (m - n,) + pts.z.shape[1:-1])
        pts = Jacobian(*(jnp.concatenate([a, b], 0) for a, b in zip(pts, pad)))
    while m > 1:
        half = m // 2
        left = Jacobian(*(a[:half] for a in pts))
        right = Jacobian(*(a[half:] for a in pts))
        pts = jac_add(curve, left, right)
        m = half
    return Jacobian(pts.x[0], pts.y[0], pts.z[0])


@_cjit
def msm_bitserial(curve: CurveSpec, points: Affine, scalars_mont) -> Jacobian:
    """MSM for small N: bit-serial double-and-add with a masked tree sum.

    points: (N,) Affine, scalars_mont: (N, NLIMBS).  O(256) sequential steps,
    each a width-N vectorised masked tree reduction.  Used for the small MSMs
    in tests and verifier-side combines; Pippenger (ops/msm.py) covers large N.
    """
    bits = fp.canonical_bits(curve.fr, scalars_mont)  # (N, 256)
    nbits = bits.shape[-1]
    pts_jac = from_affine(curve, points)

    def body(acc, i):
        acc = _dbl_raw(curve, acc)
        mask = bits[:, nbits - 1 - i] == 1
        sel = _where_pt(mask, pts_jac, jacobian_zero(curve, (bits.shape[0],)))
        acc = jac_add(curve, acc, _tree_reduce(curve, sel))
        return acc, None

    acc, _ = jax.lax.scan(body, jacobian_zero(curve, ()), jnp.arange(nbits))
    return acc


@_cjit
def lincomb(curve: CurveSpec, points: Jacobian, scalars_mont) -> Jacobian:
    """Linear combination of a few Jacobian points (batched bit-serial).

    Same as msm_bitserial but for Jacobian inputs, used for verifier-side
    commitment combines (reference hp_as/mod.rs:391-406).
    """
    bits = fp.canonical_bits(curve.fr, scalars_mont)
    nbits = bits.shape[-1]

    def body(acc, i):
        acc = _dbl_raw(curve, acc)
        mask = bits[:, nbits - 1 - i] == 1
        sel = _where_pt(mask, points, jacobian_zero(curve, (bits.shape[0],)))
        acc = jac_add(curve, acc, _tree_reduce(curve, sel))
        return acc, None

    acc, _ = jax.lax.scan(body, jacobian_zero(curve, ()), jnp.arange(nbits))
    return acc
