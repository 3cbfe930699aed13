"""Pippenger MSM on the float32 limb engine (fields/fp32.py).

Same bucket-slot-matrix structure as ops/msm.py, with all group arithmetic on
f32 9-bit limbs — native VPU multiplies instead of XLA's emulated uint32
path.  Scalars/digit scheduling stay on the uint32 engine (bit extraction is
integer work); points convert at the boundary.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from accumulation_tpu.curves.weierstrass import Affine, CurveSpec
from accumulation_tpu.fields import fp
import fp32
from fp32 import F32Spec, NLIMBS as NL32, DTYPE as F32

# ---------------------------------------------------------------------------
# f32 projective point kernels (complete RCB15 formulas, a = 0)
# ---------------------------------------------------------------------------


class P32(NamedTuple):
    x: jnp.ndarray  # (..., 29) f32 limbs, Montgomery R' form
    y: jnp.ndarray
    z: jnp.ndarray


class A32(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # (...) bool


@functools.lru_cache(maxsize=None)
def _consts(curve: CurveSpec):
    es = fp32.make_f32(curve.fq)
    p = curve.fq.modulus
    Rp = 1 << (fp32.LIMB_BITS * fp32.NLIMBS)
    b3 = (3 * curve.b % p) * Rp % p
    one = Rp % p
    return es, np.asarray(fp32.int_to_limbs9(b3)), np.asarray(
        fp32.int_to_limbs9(one))


def zero32(curve: CurveSpec, shape=()) -> P32:
    es, b3, one = _consts(curve)
    z = jnp.zeros(shape + (NL32,), F32)
    return P32(z, jnp.broadcast_to(jnp.asarray(one), shape + (NL32,)), z)


def _add_mixed32(curve: CurveSpec, pt: P32, q: A32) -> P32:
    es, b3c, _ = _consts(curve)
    f = es
    b3 = jnp.asarray(b3c)
    X1, Y1, Z1 = pt
    X2, Y2 = q.x, q.y
    mul, add, sub = fp32._mul_raw, fp32._add_raw, fp32._sub_raw
    t0 = mul(f, X1, X2)
    t1 = mul(f, Y1, Y2)
    t3 = mul(f, add(f, X2, Y2), add(f, X1, Y1))
    t3 = sub(f, t3, add(f, t0, t1))
    t4 = add(f, mul(f, Y2, Z1), Y1)
    Y3 = add(f, mul(f, X2, Z1), X1)
    t0 = add(f, add(f, t0, t0), t0)
    t2 = mul(f, jnp.broadcast_to(b3, Z1.shape), Z1)
    Z3 = add(f, t1, t2)
    t1 = sub(f, t1, t2)
    Y3 = mul(f, jnp.broadcast_to(b3, Y3.shape), Y3)
    X3 = mul(f, t4, Y3)
    X3 = sub(f, mul(f, t3, t1), X3)
    Y3 = mul(f, Y3, t0)
    Y3 = add(f, mul(f, t1, Z3), Y3)
    t0 = mul(f, t0, t3)
    Z3 = add(f, mul(f, Z3, t4), t0)
    out = P32(X3, Y3, Z3)
    qinf = q.inf[..., None]
    return P32(
        jnp.where(qinf, jnp.broadcast_to(pt.x, out.x.shape), out.x),
        jnp.where(qinf, jnp.broadcast_to(pt.y, out.y.shape), out.y),
        jnp.where(qinf, jnp.broadcast_to(pt.z, out.z.shape), out.z))


def _add32(curve: CurveSpec, pt: P32, q: P32) -> P32:
    es, b3c, _ = _consts(curve)
    f = es
    b3 = jnp.asarray(b3c)
    mul, add, sub = fp32._mul_raw, fp32._add_raw, fp32._sub_raw
    X1, Y1, Z1 = pt
    X2, Y2, Z2 = q
    t0 = mul(f, X1, X2)
    t1 = mul(f, Y1, Y2)
    t2 = mul(f, Z1, Z2)
    t3 = mul(f, add(f, X1, Y1), add(f, X2, Y2))
    t3 = sub(f, t3, add(f, t0, t1))
    t4 = mul(f, add(f, Y1, Z1), add(f, Y2, Z2))
    t4 = sub(f, t4, add(f, t1, t2))
    X3 = mul(f, add(f, X1, Z1), add(f, X2, Z2))
    Y3 = sub(f, X3, add(f, t0, t2))
    t0 = add(f, add(f, t0, t0), t0)
    t2 = mul(f, jnp.broadcast_to(b3, t2.shape), t2)
    Z3 = add(f, t1, t2)
    t1 = sub(f, t1, t2)
    Y3 = mul(f, jnp.broadcast_to(b3, Y3.shape), Y3)
    X3 = mul(f, t4, Y3)
    X3 = sub(f, mul(f, t3, t1), X3)
    Y3 = mul(f, Y3, t0)
    Y3 = add(f, mul(f, t1, Z3), Y3)
    t0 = mul(f, t0, t3)
    Z3 = add(f, mul(f, Z3, t4), t0)
    return P32(X3, Y3, Z3)


def _dbl32(curve: CurveSpec, pt: P32) -> P32:
    es, b3c, _ = _consts(curve)
    f = es
    b3 = jnp.asarray(b3c)
    mul, add, sub = fp32._mul_raw, fp32._add_raw, fp32._sub_raw
    X, Y, Z = pt
    t0 = mul(f, Y, Y)
    Z3 = add(f, t0, t0)
    Z3 = add(f, Z3, Z3)
    Z3 = add(f, Z3, Z3)
    t1 = mul(f, Y, Z)
    t2 = mul(f, jnp.broadcast_to(b3, Z.shape), mul(f, Z, Z))
    X3 = mul(f, t2, Z3)
    Y3 = add(f, t0, t2)
    Z3 = mul(f, t1, Z3)
    t1 = add(f, t2, t2)
    t2 = add(f, t1, t2)
    t0 = sub(f, t0, t2)
    Y3 = mul(f, t0, Y3)
    Y3 = add(f, X3, Y3)
    t1 = mul(f, X, Y)
    X3 = mul(f, t0, t1)
    X3 = add(f, X3, X3)
    return P32(X3, Y3, Z3)


def _where32(cond, a: P32, b: P32) -> P32:
    c = cond[..., None]
    return P32(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y),
               jnp.where(c, a.z, b.z))


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def affine_to_f32(curve: CurveSpec, pts: Affine) -> A32:
    es, _, _ = _consts(curve)
    return A32(fp32.from_uint32(es, pts.x), fp32.from_uint32(es, pts.y),
               pts.inf)


@functools.partial(jax.jit, static_argnums=0)
def proj_to_uint32(curve: CurveSpec, pt: P32):
    from accumulation_tpu.curves.weierstrass import Projective
    es, _, _ = _consts(curve)
    return Projective(fp32.to_uint32(es, pt.x), fp32.to_uint32(es, pt.y),
                      fp32.to_uint32(es, pt.z))


# ---------------------------------------------------------------------------
# bucket phase (mirror of msm._bucket_phase on the f32 engine)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def bucket_phase32(curve: CurveSpec, points: A32, sorted_digits, perm_ranks,
                   c: int, s: int) -> P32:
    perm, ranks = perm_ranks
    w = 256 // c
    nb = 1 << c
    n = perm.shape[-1]

    valid = (sorted_digits > 0) & (ranks < s)
    lin_idx = (jnp.arange(w)[:, None] * (nb * s) + sorted_digits * s
               + jnp.clip(ranks, 0, s - 1))
    lin_idx = jnp.where(valid, lin_idx, w * nb * s)
    slot_flat = jnp.full((w * nb * s + 1,), n, dtype=jnp.int32)
    slot_flat = slot_flat.at[lin_idx.reshape(-1)].set(
        perm.reshape(-1).astype(jnp.int32), mode="drop")
    slots = slot_flat[: w * nb * s].reshape(w, nb, s)

    px = jnp.concatenate([points.x, jnp.zeros((1, NL32), F32)], axis=0)
    py = jnp.concatenate([points.y, jnp.zeros((1, NL32), F32)], axis=0)
    pinf = jnp.concatenate([points.inf, jnp.ones((1,), bool)], axis=0)

    slots_t = jnp.transpose(slots, (2, 0, 1))
    chunk = min(s, 16)
    assert s % chunk == 0
    slots_c = slots_t.reshape(s // chunk, chunk, w, nb)

    def body(acc, idx_block):
        for t in range(chunk):
            idx = idx_block[t]
            acc = _add_mixed32(curve, acc,
                               A32(px[idx], py[idx], pinf[idx]))
        return acc, None

    init = zero32(curve, (w, nb))
    buckets, _ = jax.lax.scan(body, init, slots_c)

    AGG_UNROLL = 8
    pad_agg = (-(nb - 1)) % AGG_UNROLL
    order = jnp.concatenate(
        [jnp.arange(nb - 1, 0, -1), jnp.zeros((pad_agg,), jnp.int32)])
    order = order.reshape(-1, AGG_UNROLL)

    def agg_body(carry, vs):
        running, total = carry
        for t in range(AGG_UNROLL):
            v = vs[t]
            valid_v = jnp.broadcast_to(v > 0, (w,))
            bv = P32(buckets.x[:, v], buckets.y[:, v], buckets.z[:, v])
            running = _where32(valid_v, _add32(curve, running, bv), running)
            total = _where32(valid_v, _add32(curve, total, running), total)
        return (running, total), None

    init_agg = (zero32(curve, (w,)), zero32(curve, (w,)))
    (_, window_sums), _ = jax.lax.scan(agg_body, init_agg, order)

    total_dbl = c * (w - 1)
    DBL_UNROLL = 8
    win_idx = jnp.arange(w)

    def dbl_body(acc, i_base):
        for t in range(DBL_UNROLL):
            i = i_base + t
            mask = i < (c * win_idx)
            acc = _where32(mask, _dbl32(curve, acc), acc)
        return acc, None

    n_steps = (total_dbl + DBL_UNROLL - 1) // DBL_UNROLL
    acc, _ = jax.lax.scan(dbl_body, window_sums,
                          jnp.arange(n_steps) * DBL_UNROLL)
    # tree-reduce over windows
    m = w
    pts = acc
    while m > 1:
        half = m // 2
        left = P32(*(a[:half] for a in pts))
        right = P32(*(a[half:2 * half] for a in pts))
        summed = _add32(curve, left, right)
        if m % 2:
            summed = P32(*(jnp.concatenate([a, b[-1:]], 0)
                           for a, b in zip(summed, pts)))
            m = half + 1
        else:
            m = half
        pts = summed
    return P32(pts.x[0], pts.y[0], pts.z[0])


def msm32(curve: CurveSpec, points: Affine, scalars_mont, c: int = 8):
    """Full MSM on the f32 engine; returns a uint32-engine Projective."""
    from . import msm as msm_mod
    sorted_digits, perm, ranks, max_count = msm_mod._digits_and_sort(
        curve, scalars_mont, c)
    s = int(max_count)
    if s == 0:
        from accumulation_tpu.curves import weierstrass as wst
        return wst.projective_zero(curve, ())
    s = min(1 << (s - 1).bit_length(), points.x.shape[0])
    s = max(s, 16)
    pts32 = affine_to_f32(curve, points)
    out = bucket_phase32(curve, pts32, sorted_digits, (perm, ranks), c, s)
    return proj_to_uint32(curve, out)
