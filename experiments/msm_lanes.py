"""Pippenger MSM bucket phase on the lane-major engine (fields/fp_lanes.py).

Identical structure to ops/msm.py's bucket phase with all tensors transposed
limb-major, so group arithmetic runs at full VPU lane width.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from accumulation_tpu.curves.weierstrass import Affine, CurveSpec
from accumulation_tpu.fields import fp
import fp_lanes as fl
from accumulation_tpu.fields.fp import NLIMBS, DTYPE

import os as _os
_ON_CPU = "cpu" in _os.environ.get("JAX_PLATFORMS", "")
SWEEP_CHUNK = 2 if _ON_CPU else 16
DBL_UNROLL = 1 if _ON_CPU else 8


class PL(NamedTuple):  # projective, lane-major: (NLIMBS, ...)
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class AL(NamedTuple):  # affine, lane-major + inf (...)
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


def zero_l(curve: CurveSpec, shape=()) -> PL:
    z = jnp.zeros((NLIMBS,) + shape, DTYPE)
    one = jnp.broadcast_to(
        jnp.asarray(curve.fq.one_mont, DTYPE).reshape(
            (NLIMBS,) + (1,) * len(shape)), (NLIMBS,) + shape)
    return PL(z, one, z)


def _b3(curve: CurveSpec, ref):
    return jnp.asarray(curve.b3_mont, DTYPE).reshape(
        (NLIMBS,) + (1,) * (ref.ndim - 1))


def add_mixed_l(curve: CurveSpec, p: PL, q: AL) -> PL:
    f = curve.fq
    b3 = jnp.broadcast_to(_b3(curve, p.z), p.z.shape)
    X1, Y1, Z1 = p
    X2, Y2 = q.x, q.y
    t0 = fl.mul(f, X1, X2)
    t1 = fl.mul(f, Y1, Y2)
    t3 = fl.mul(f, fl.add(f, X2, Y2), fl.add(f, X1, Y1))
    t3 = fl.sub(f, t3, fl.add(f, t0, t1))
    t4 = fl.add(f, fl.mul(f, Y2, Z1), Y1)
    Y3 = fl.add(f, fl.mul(f, X2, Z1), X1)
    t0 = fl.add(f, fl.add(f, t0, t0), t0)
    t2 = fl.mul(f, b3, Z1)
    Z3 = fl.add(f, t1, t2)
    t1 = fl.sub(f, t1, t2)
    Y3 = fl.mul(f, b3, Y3)
    X3 = fl.mul(f, t4, Y3)
    X3 = fl.sub(f, fl.mul(f, t3, t1), X3)
    Y3 = fl.mul(f, Y3, t0)
    Y3 = fl.add(f, fl.mul(f, t1, Z3), Y3)
    t0 = fl.mul(f, t0, t3)
    Z3 = fl.add(f, fl.mul(f, Z3, t4), t0)
    out = PL(X3, Y3, Z3)
    qinf = q.inf[None]
    return PL(
        jnp.where(qinf, jnp.broadcast_to(p.x, out.x.shape), out.x),
        jnp.where(qinf, jnp.broadcast_to(p.y, out.y.shape), out.y),
        jnp.where(qinf, jnp.broadcast_to(p.z, out.z.shape), out.z))


def add_l(curve: CurveSpec, p: PL, q: PL) -> PL:
    f = curve.fq
    b3 = jnp.broadcast_to(_b3(curve, p.z), p.z.shape)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = fl.mul(f, X1, X2)
    t1 = fl.mul(f, Y1, Y2)
    t2 = fl.mul(f, Z1, Z2)
    t3 = fl.mul(f, fl.add(f, X1, Y1), fl.add(f, X2, Y2))
    t3 = fl.sub(f, t3, fl.add(f, t0, t1))
    t4 = fl.mul(f, fl.add(f, Y1, Z1), fl.add(f, Y2, Z2))
    t4 = fl.sub(f, t4, fl.add(f, t1, t2))
    X3 = fl.mul(f, fl.add(f, X1, Z1), fl.add(f, X2, Z2))
    Y3 = fl.sub(f, X3, fl.add(f, t0, t2))
    t0 = fl.add(f, fl.add(f, t0, t0), t0)
    t2 = fl.mul(f, b3, t2)
    Z3 = fl.add(f, t1, t2)
    t1 = fl.sub(f, t1, t2)
    Y3 = fl.mul(f, b3, Y3)
    X3 = fl.mul(f, t4, Y3)
    X3 = fl.sub(f, fl.mul(f, t3, t1), X3)
    Y3 = fl.mul(f, Y3, t0)
    Y3 = fl.add(f, fl.mul(f, t1, Z3), Y3)
    t0 = fl.mul(f, t0, t3)
    Z3 = fl.add(f, fl.mul(f, Z3, t4), t0)
    return PL(X3, Y3, Z3)


def dbl_l(curve: CurveSpec, p: PL) -> PL:
    f = curve.fq
    b3 = jnp.broadcast_to(_b3(curve, p.z), p.z.shape)
    X, Y, Z = p
    t0 = fl.mul(f, Y, Y)
    Z3 = fl.add(f, t0, t0)
    Z3 = fl.add(f, Z3, Z3)
    Z3 = fl.add(f, Z3, Z3)
    t1 = fl.mul(f, Y, Z)
    t2 = fl.mul(f, b3, fl.mul(f, Z, Z))
    X3 = fl.mul(f, t2, Z3)
    Y3 = fl.add(f, t0, t2)
    Z3 = fl.mul(f, t1, Z3)
    t1 = fl.add(f, t2, t2)
    t2 = fl.add(f, t1, t2)
    t0 = fl.sub(f, t0, t2)
    Y3 = fl.mul(f, t0, Y3)
    Y3 = fl.add(f, X3, Y3)
    t1 = fl.mul(f, X, Y)
    X3 = fl.mul(f, t0, t1)
    X3 = fl.add(f, X3, X3)
    return PL(X3, Y3, Z3)


def where_l(cond, a: PL, b: PL) -> PL:
    c = cond[None]
    return PL(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y),
              jnp.where(c, a.z, b.z))


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 8, 10))
def bucket_phase_lanes(curve: CurveSpec, points: Affine, sorted_digits,
                       perm_ranks, c: int, s: int, stage: str = "full",
                       signs=None, signed: bool = False, overflow=None,
                       dbl_counts=None):
    """Lane-major bucket phase; returns a standard Projective (uint32).

    Mirrors ops/msm.py `_bucket_phase` (signed digits, overflow window,
    log-depth aggregation) with all tensors transposed limb-major so group
    arithmetic runs at full VPU lane width — the 1.7x layout win measured
    in round 1, now on the product path.

    stage: "sweep" returns after the slot sweep, "agg" after per-window
    aggregation, "full" (default) the MSM result.
    dbl_counts: optional static per-row doubling counts for virtual-window
    rows (msm._split_hot_window); None = row i doubles c*i times."""
    from ..curves.weierstrass import Projective
    perm, ranks = perm_ranks
    w = sorted_digits.shape[0]  # window ROWS (= 256/c unless split)
    nb = ((1 << (c - 1)) + 1) if signed else (1 << c)
    n = perm.shape[-1]

    valid = (sorted_digits > 0) & (ranks < s)
    lin_idx = (jnp.arange(w)[:, None] * (nb * s) + sorted_digits * s
               + jnp.clip(ranks, 0, s - 1))
    lin_idx = jnp.where(valid, lin_idx, w * nb * s)
    scatter_vals = perm.astype(jnp.int32)
    if signed:
        # fold the sign into the table index: negated points live at +n+1
        scatter_vals = scatter_vals + (n + 1) * signs.astype(jnp.int32)
    slot_flat = jnp.full((w * nb * s + 1,), n, dtype=jnp.int32)
    slot_flat = slot_flat.at[lin_idx.reshape(-1)].set(
        scatter_vals.reshape(-1), mode="drop")
    slots = slot_flat[: w * nb * s].reshape(w, nb, s)

    # lane-major point tables with sentinel (and negated copies if signed)
    px = jnp.concatenate(
        [fl.to_lanes(points.x), jnp.zeros((NLIMBS, 1), DTYPE)], axis=1)
    py = jnp.concatenate(
        [fl.to_lanes(points.y), jnp.zeros((NLIMBS, 1), DTYPE)], axis=1)
    pinf = jnp.concatenate([points.inf, jnp.ones((1,), bool)], axis=0)
    if signed:
        py_neg = jnp.concatenate(
            [fl.to_lanes(fp.neg(curve.fq, points.y)),
             jnp.zeros((NLIMBS, 1), DTYPE)], axis=1)
        px = jnp.concatenate([px, px], axis=1)
        py = jnp.concatenate([py, py_neg], axis=1)
        pinf = jnp.concatenate([pinf, pinf], axis=0)

    slots_t = jnp.transpose(slots, (2, 0, 1))  # (S, W, NB)
    chunk = min(s, SWEEP_CHUNK)
    assert s % chunk == 0
    slots_c = slots_t.reshape(s // chunk, chunk, w, nb)

    def body(acc, idx_block):
        for t in range(chunk):
            idx = idx_block[t]  # (W, NB)
            q = AL(px[:, idx], py[:, idx], pinf[idx])
            acc = add_mixed_l(curve, acc, q)
        return acc, None

    init = zero_l(curve, (w, nb))
    buckets, _ = jax.lax.scan(body, init, slots_c)
    if stage == "sweep":
        return Projective(fl.from_lanes(buckets.x[:, :, 0]),
                          fl.from_lanes(buckets.y[:, :, 0]),
                          fl.from_lanes(buckets.z[:, :, 0]))

    # per-window weighted aggregation, log-depth (see ops/msm.py):
    # sum_{v>=1} v*B_v = sum_k S_k, S_k = suffix sums via associative scan
    bpos = PL(buckets.x[:, :, 1:], buckets.y[:, :, 1:], buckets.z[:, :, 1:])
    rev = PL(bpos.x[..., ::-1], bpos.y[..., ::-1], bpos.z[..., ::-1])
    suf = jax.lax.associative_scan(
        lambda p, q: add_l(curve, PL(*p), PL(*q)), tuple(rev), axis=2)
    m_ax = nb - 1
    pts_agg = PL(*suf)
    while m_ax > 1:
        half_ax = m_ax // 2
        left = PL(*(t[..., :half_ax] for t in pts_agg))
        right = PL(*(t[..., half_ax:2 * half_ax] for t in pts_agg))
        summed = add_l(curve, left, right)
        if m_ax % 2:
            summed = PL(*(jnp.concatenate([a, b[..., -1:]], axis=-1)
                          for a, b in zip(summed, pts_agg)))
            m_ax = half_ax + 1
        else:
            m_ax = half_ax
        pts_agg = summed
    window_sums = PL(pts_agg.x[..., 0], pts_agg.y[..., 0], pts_agg.z[..., 0])
    if stage == "agg":
        return Projective(fl.from_lanes(window_sums.x),
                          fl.from_lanes(window_sums.y),
                          fl.from_lanes(window_sums.z))

    # overflow window (k+r recode carry): 2^256 * sum of flagged points,
    # appended as window index W (doubling count c*W == 256)
    n_win = w
    if overflow is not None:
        one_l = jnp.broadcast_to(
            jnp.asarray(curve.fq.one_mont, DTYPE).reshape(NLIMBS, 1),
            (NLIMBS, n))
        live = (overflow & ~points.inf)[None, :]
        spts = PL(jnp.where(live, fl.to_lanes(points.x), 0),
                  jnp.where(live, fl.to_lanes(points.y), one_l),
                  jnp.where(live, one_l, jnp.zeros_like(one_l)))
        m_s = n
        while m_s > 1:
            half_s = m_s // 2
            left = PL(*(a[:, :half_s] for a in spts))
            right = PL(*(a[:, half_s:2 * half_s] for a in spts))
            summed = add_l(curve, left, right)
            if m_s % 2:
                summed = PL(*(jnp.concatenate([a, b[:, -1:]], 1)
                              for a, b in zip(summed, spts)))
                m_s = half_s + 1
            else:
                m_s = half_s
            spts = summed
        window_sums = PL(*(jnp.concatenate([a, b[:, :1]], axis=1)
                           for a, b in zip(window_sums, spts)))
        n_win = w + 1

    if dbl_counts is None:
        dbl_per_row = tuple(c * i for i in range(n_win))
    else:
        dbl_per_row = tuple(dbl_counts) + ((256,) if overflow is not None
                                           else ())
        assert len(dbl_per_row) == n_win
    total_dbl = max(dbl_per_row)
    dbl_arr = jnp.asarray(dbl_per_row)

    def dbl_body(acc, i_base):
        for t in range(DBL_UNROLL):
            i = i_base + t
            mask = i < dbl_arr
            acc = where_l(mask, dbl_l(curve, acc), acc)
        return acc, None

    n_steps = (total_dbl + DBL_UNROLL - 1) // DBL_UNROLL
    acc, _ = jax.lax.scan(dbl_body, window_sums,
                          jnp.arange(n_steps) * DBL_UNROLL)
    m = n_win
    pts = acc
    while m > 1:
        half = m // 2
        left = PL(*(a[:, :half] for a in pts))
        right = PL(*(a[:, half:2 * half] for a in pts))
        summed = add_l(curve, left, right)
        if m % 2:
            summed = PL(*(jnp.concatenate([a, b[:, -1:]], 1)
                          for a, b in zip(summed, pts)))
            m = half + 1
        else:
            m = half
        pts = summed
    out = PL(pts.x[:, 0], pts.y[:, 0], pts.z[:, 0])
    return Projective(fl.from_lanes(out.x), fl.from_lanes(out.y),
                      fl.from_lanes(out.z))


def msm_lanes(curve: CurveSpec, points: Affine, scalars_mont, c: int = 8):
    """Full MSM via the lane-major bucket phase."""
    from . import msm as msm_mod
    from ..curves import weierstrass as wst
    sorted_digits, perm, ranks, max_count = msm_mod._digits_and_sort(
        curve, scalars_mont, c)
    s = int(max_count)
    if s == 0:
        return wst.projective_zero(curve, ())
    s = min(1 << (s - 1).bit_length(), points.x.shape[0])
    s = max(s, 16)
    return bucket_phase_lanes(curve, points, sorted_digits, (perm, ranks), c, s)
