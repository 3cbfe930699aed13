"""Pippenger MSM bucket phase on the redundant-f32 8-bit-limb engine
(fields/fp8).

Same slot-matrix structure as ops/msm.py, with the group arithmetic running
on fields/fp8.py: every limb product is an exact float multiply (see the
fp8 docstring), sidestepping the TPU's emulated integer multiplier, and
every carry is a vectorized pass — no sequential chains anywhere in the
sweep, so both the XLA graphs and the runtime critical path stay small.

Layout: lane-major (nl8, ...batch) f32; batch fills the VPU lanes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
# thin unrolls on the XLA:CPU test backend (compile-time), and small TPU
# defaults for the memory-constrained remote compile helper (see ops/msm.py
# unroll-history note)
_ON_CPU = "cpu" in _os.environ.get("JAX_PLATFORMS", "")
SWEEP_CHUNK = int(_os.environ.get(
    "ACCUM_TPU_FP8_SWEEP_CHUNK", "2" if _ON_CPU else "4"))
DBL_UNROLL_N = int(_os.environ.get(
    "ACCUM_TPU_FP8_DBL_UNROLL", "1" if _ON_CPU else "2"))
# Pallas sweep kernel (ops/msm_pallas.py): opt-in.  Measured on the v5e
# (2^16, c=8, s=1280): 2.1 s bucket phase at its best tuning vs ~0.8 s for
# the u32 XLA sweep — the MXU conv-as-matmul formulation amplifies work 78x
# (selection matrix), so it stays an experiment (see msm_pallas docstring).
_PALLAS_SWEEP = _os.environ.get("ACCUM_TPU_PALLAS_SWEEP", "0") == "1"

from ..curves.weierstrass import Affine, CurveSpec, Projective
from ..fields import fp, fp8
from ..fields.fp import DTYPE


class P8(NamedTuple):  # projective, lane-major f32: (nl8, ...)
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class A8(NamedTuple):  # affine, lane-major f32 + inf (...)
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


def zero8(curve: CurveSpec, shape=()) -> P8:
    f = curve.fq
    return P8(fp8.zero(f, shape), fp8.one(f, shape), fp8.zero(f, shape))


def _b3(curve: CurveSpec, ref):
    ov = fp8.get_override("b3")
    if ov is not None:
        return ov.reshape((ov.shape[-1],) + (1,) * (ref.ndim - 1))
    return fp8.const8(curve.fq, 3 * curve.b % curve.fq.modulus, ref.ndim)


def where8(cond, a: P8, b: P8) -> P8:
    c = cond[None]
    return P8(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y),
              jnp.where(c, a.z, b.z))


def add_mixed8(curve: CurveSpec, p: P8, q: A8) -> P8:
    """RCB15 algorithm 8 (Z2 = 1) + select for q = infinity."""
    f = curve.fq
    b3 = jnp.broadcast_to(_b3(curve, p.z), p.z.shape)
    X1, Y1, Z1 = p
    X2, Y2 = q.x, q.y
    t0 = fp8.mul(f, X1, X2)
    t1 = fp8.mul(f, Y1, Y2)
    t3 = fp8.mul(f, fp8.add(f, X2, Y2), fp8.add(f, X1, Y1))
    t3 = fp8.sub(f, t3, fp8.add(f, t0, t1))
    t4 = fp8.add(f, fp8.mul(f, Y2, Z1), Y1)
    Y3 = fp8.add(f, fp8.mul(f, X2, Z1), X1)
    t0 = fp8.add(f, fp8.add(f, t0, t0), t0)
    t2 = fp8.mul(f, b3, Z1)
    Z3 = fp8.add(f, t1, t2)
    t1 = fp8.sub(f, t1, t2)
    Y3 = fp8.mul(f, b3, Y3)
    X3 = fp8.mul(f, t4, Y3)
    X3 = fp8.sub(f, fp8.mul(f, t3, t1), X3)
    Y3 = fp8.mul(f, Y3, t0)
    Y3 = fp8.add(f, fp8.mul(f, t1, Z3), Y3)
    t0 = fp8.mul(f, t0, t3)
    Z3 = fp8.add(f, fp8.mul(f, Z3, t4), t0)
    out = P8(X3, Y3, Z3)
    qinf = q.inf[None]
    return P8(
        jnp.where(qinf, jnp.broadcast_to(p.x, out.x.shape), out.x),
        jnp.where(qinf, jnp.broadcast_to(p.y, out.y.shape), out.y),
        jnp.where(qinf, jnp.broadcast_to(p.z, out.z.shape), out.z))


def add8(curve: CurveSpec, p: P8, q: P8) -> P8:
    """RCB15 algorithm 7: complete projective addition."""
    f = curve.fq
    b3 = jnp.broadcast_to(_b3(curve, p.z), p.z.shape)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = fp8.mul(f, X1, X2)
    t1 = fp8.mul(f, Y1, Y2)
    t2 = fp8.mul(f, Z1, Z2)
    t3 = fp8.mul(f, fp8.add(f, X1, Y1), fp8.add(f, X2, Y2))
    t3 = fp8.sub(f, t3, fp8.add(f, t0, t1))
    t4 = fp8.mul(f, fp8.add(f, Y1, Z1), fp8.add(f, Y2, Z2))
    t4 = fp8.sub(f, t4, fp8.add(f, t1, t2))
    X3 = fp8.mul(f, fp8.add(f, X1, Z1), fp8.add(f, X2, Z2))
    Y3 = fp8.sub(f, X3, fp8.add(f, t0, t2))
    t0 = fp8.add(f, fp8.add(f, t0, t0), t0)
    t2 = fp8.mul(f, b3, t2)
    Z3 = fp8.add(f, t1, t2)
    t1 = fp8.sub(f, t1, t2)
    Y3 = fp8.mul(f, b3, Y3)
    X3 = fp8.mul(f, t4, Y3)
    X3 = fp8.sub(f, fp8.mul(f, t3, t1), X3)
    Y3 = fp8.mul(f, Y3, t0)
    Y3 = fp8.add(f, fp8.mul(f, t1, Z3), Y3)
    t0 = fp8.mul(f, t0, t3)
    Z3 = fp8.add(f, fp8.mul(f, Z3, t4), t0)
    return P8(X3, Y3, Z3)


def dbl8(curve: CurveSpec, p: P8) -> P8:
    """RCB15 algorithm 9: complete doubling."""
    f = curve.fq
    b3 = jnp.broadcast_to(_b3(curve, p.z), p.z.shape)
    X, Y, Z = p
    t0 = fp8.mul(f, Y, Y)
    Z3 = fp8.add(f, t0, t0)
    Z3 = fp8.add(f, Z3, Z3)
    Z3 = fp8.add(f, Z3, Z3)
    t1 = fp8.mul(f, Y, Z)
    t2 = fp8.mul(f, b3, fp8.mul(f, Z, Z))
    X3 = fp8.mul(f, t2, Z3)
    Y3 = fp8.add(f, t0, t2)
    Z3 = fp8.mul(f, t1, Z3)
    t1 = fp8.add(f, t2, t2)
    t2 = fp8.add(f, t1, t2)
    t0 = fp8.sub(f, t0, t2)
    Y3 = fp8.mul(f, t0, Y3)
    Y3 = fp8.add(f, X3, Y3)
    t1 = fp8.mul(f, X, Y)
    X3 = fp8.mul(f, t0, t1)
    X3 = fp8.add(f, X3, X3)
    return P8(X3, Y3, Z3)


def bucket_phase8(curve: CurveSpec, points: Affine, sorted_digits,
                  perm_ranks, c: int, s: int, stage: str = "full",
                  signs=None, signed: bool = False, overflow=None):
    """f32-engine bucket phase; returns a standard u32 Projective.

    stage: "sweep" / "agg" / "full" — profiling hooks.
    signed: digits are magnitudes in [0, 2^(c-1)], `signs` (W, N) selects
    the negated point (see msm._signed_digits_and_ranks).
    overflow: optional (N,) bool — k+r recode carries, folded in as a
    2^256-weighted extra window via a masked log-depth tree-sum.

    With the Pallas sweep enabled the three stages run as SEPARATE jitted
    graphs (prepare / sweep / combine) — the remote TPU compile helper has
    been OOM-killed on the monolithic module."""
    if _PALLAS_SWEEP and stage == "full":
        from . import msm_pallas
        n = perm_ranks[0].shape[-1]
        slots_t, px, py, pinf = _prepare8(
            curve, points, sorted_digits, perm_ranks, c, s,
            signs=signs, signed=signed)
        buckets = msm_pallas.sweep_pallas(
            curve, px, py, pinf, slots_t, s, n, msm_pallas.CHUNK)
        return _combine8(curve, points, buckets, c, overflow)
    return _bucket_phase8_xla(curve, points, sorted_digits, perm_ranks,
                              c, s, stage, signs, signed, overflow)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 7))
def _prepare8(curve: CurveSpec, points: Affine, sorted_digits, perm_ranks,
              c: int, s: int, signs=None, signed: bool = False):
    """Slot matrix + fp8 point tables (stage 1 of the Pallas path)."""
    perm, ranks = perm_ranks
    nbits = sorted_digits.shape[0] * c
    w = nbits // c
    nb = ((1 << (c - 1)) + 1) if signed else (1 << c)
    n = perm.shape[-1]

    valid = (sorted_digits > 0) & (ranks < s)
    lin_idx = (jnp.arange(w)[:, None] * (nb * s) + sorted_digits * s
               + jnp.clip(ranks, 0, s - 1))
    lin_idx = jnp.where(valid, lin_idx, w * nb * s)
    scatter_vals = perm.astype(jnp.int32)
    if signed:
        scatter_vals = scatter_vals + (n + 1) * signs.astype(jnp.int32)
    slot_flat = jnp.full((w * nb * s + 1,), n, dtype=jnp.int32)
    slot_flat = slot_flat.at[lin_idx.reshape(-1)].set(
        scatter_vals.reshape(-1), mode="drop")
    slots = slot_flat[: w * nb * s].reshape(w, nb, s)

    nl8 = fp8.NL8(curve.fq)
    px = jnp.concatenate(
        [fp8.to8(curve.fq, points.x), jnp.zeros((nl8, 1), fp8.F32)], axis=1)
    py = jnp.concatenate(
        [fp8.to8(curve.fq, points.y), jnp.zeros((nl8, 1), fp8.F32)], axis=1)
    pinf = jnp.concatenate([points.inf, jnp.ones((1,), bool)], axis=0)
    if signed:
        py_neg = jnp.concatenate(
            [fp8.to8(curve.fq, fp.neg(curve.fq, points.y)),
             jnp.zeros((nl8, 1), fp8.F32)], axis=1)
        px = jnp.concatenate([px, px], axis=1)
        py = jnp.concatenate([py, py_neg], axis=1)
        pinf = jnp.concatenate([pinf, pinf], axis=0)
    return jnp.transpose(slots, (2, 0, 1)), px, py, pinf


@functools.partial(jax.jit, static_argnums=(0, 3))
def _combine8(curve: CurveSpec, points: Affine, buckets: P8, c: int,
              overflow=None) -> Projective:
    """Aggregation + overflow window + window combine (stage 3).

    Same algorithm as the tail of `_bucket_phase8_xla` (log-depth suffix
    aggregation, masked overflow tree, batched doubling chains)."""
    w, nb = buckets.x.shape[1], buckets.x.shape[2]
    n = points.x.shape[0]
    f = curve.fq

    def to_u32_proj(p8: P8) -> Projective:
        return Projective(fp8.from8(f, p8.x), fp8.from8(f, p8.y),
                          fp8.from8(f, p8.z))

    bpos = P8(buckets.x[:, :, 1:], buckets.y[:, :, 1:], buckets.z[:, :, 1:])
    rev = P8(bpos.x[..., ::-1], bpos.y[..., ::-1], bpos.z[..., ::-1])
    suf = jax.lax.associative_scan(
        lambda p, q: add8(curve, p, q), rev, axis=2)
    m_ax = nb - 1
    pts_agg = suf
    while m_ax > 1:
        half_ax = m_ax // 2
        left = P8(*(t[..., :half_ax] for t in pts_agg))
        right = P8(*(t[..., half_ax:2 * half_ax] for t in pts_agg))
        summed = add8(curve, left, right)
        if m_ax % 2:
            summed = P8(*(jnp.concatenate([a, b[..., -1:]], axis=-1)
                          for a, b in zip(summed, pts_agg)))
            m_ax = half_ax + 1
        else:
            m_ax = half_ax
        pts_agg = summed
    window_sums = P8(pts_agg.x[..., 0], pts_agg.y[..., 0], pts_agg.z[..., 0])

    n_win = w
    if overflow is not None:
        one8v = fp8.one(f, (n,))
        live = (overflow & ~points.inf)[None, :]
        sx = jnp.where(live, fp8.to8(f, points.x), 0.0)
        sy = jnp.where(live, fp8.to8(f, points.y), one8v)
        sz = jnp.where(live, one8v, jnp.zeros_like(one8v))
        spts = P8(sx, sy, sz)
        m_s = n
        while m_s > 1:
            half_s = m_s // 2
            left = P8(*(a[:, :half_s] for a in spts))
            right = P8(*(a[:, half_s:2 * half_s] for a in spts))
            summed = add8(curve, left, right)
            if m_s % 2:
                summed = P8(*(jnp.concatenate([a, b[:, -1:]], 1)
                              for a, b in zip(summed, spts)))
                m_s = half_s + 1
            else:
                m_s = half_s
            spts = summed
        window_sums = P8(*(jnp.concatenate([a, b[:, :1]], axis=1)
                           for a, b in zip(window_sums, spts)))
        n_win = w + 1

    total_dbl = c * (n_win - 1)
    win_idx = jnp.arange(n_win)

    def dbl_body(acc, i_base):
        for t in range(DBL_UNROLL_N):
            i = i_base + t
            mask = i < (c * win_idx)
            acc = where8(mask, dbl8(curve, acc), acc)
        return acc, None

    n_steps = (total_dbl + DBL_UNROLL_N - 1) // DBL_UNROLL_N
    acc, _ = jax.lax.scan(dbl_body, window_sums,
                          jnp.arange(n_steps) * DBL_UNROLL_N)
    m = n_win
    pts = acc
    while m > 1:
        half = m // 2
        left = P8(*(a[:, :half] for a in pts))
        right = P8(*(a[:, half:2 * half] for a in pts))
        summed = add8(curve, left, right)
        if m % 2:
            summed = P8(*(jnp.concatenate([a, b[:, -1:]], 1)
                          for a, b in zip(summed, pts)))
            m = half + 1
        else:
            m = half
        pts = summed
    return to_u32_proj(P8(pts.x[:, 0], pts.y[:, 0], pts.z[:, 0]))


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 8))
def _bucket_phase8_xla(curve: CurveSpec, points: Affine, sorted_digits,
                       perm_ranks, c: int, s: int, stage: str = "full",
                       signs=None, signed: bool = False, overflow=None):
    """Single-graph XLA variant (profiling stages + non-Pallas fallback)."""
    perm, ranks = perm_ranks
    nbits = sorted_digits.shape[0] * c
    w = nbits // c
    nb = ((1 << (c - 1)) + 1) if signed else (1 << c)
    n = perm.shape[-1]

    valid = (sorted_digits > 0) & (ranks < s)
    lin_idx = (jnp.arange(w)[:, None] * (nb * s) + sorted_digits * s
               + jnp.clip(ranks, 0, s - 1))
    lin_idx = jnp.where(valid, lin_idx, w * nb * s)
    scatter_vals = perm.astype(jnp.int32)
    if signed:
        scatter_vals = scatter_vals + (n + 1) * signs.astype(jnp.int32)
    slot_flat = jnp.full((w * nb * s + 1,), n, dtype=jnp.int32)
    slot_flat = slot_flat.at[lin_idx.reshape(-1)].set(
        scatter_vals.reshape(-1), mode="drop")
    slots = slot_flat[: w * nb * s].reshape(w, nb, s)

    # f32 8-bit-limb point tables with infinity sentinel at index n
    nl8 = fp8.NL8(curve.fq)
    px = jnp.concatenate(
        [fp8.to8(curve.fq, points.x), jnp.zeros((nl8, 1), fp8.F32)], axis=1)
    py = jnp.concatenate(
        [fp8.to8(curve.fq, points.y), jnp.zeros((nl8, 1), fp8.F32)], axis=1)
    pinf = jnp.concatenate([points.inf, jnp.ones((1,), bool)], axis=0)
    if signed:
        py_neg = jnp.concatenate(
            [fp8.to8(curve.fq, fp.neg(curve.fq, points.y)),
             jnp.zeros((nl8, 1), fp8.F32)], axis=1)
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
            q = A8(px[:, idx], py[:, idx], pinf[idx])
            acc = add_mixed8(curve, acc, q)
        return acc, None

    init = zero8(curve, (w, nb))
    buckets, _ = jax.lax.scan(body, init, slots_c)

    def to_u32_proj(p8: P8) -> Projective:
        f = curve.fq
        return Projective(fp8.from8(f, p8.x), fp8.from8(f, p8.y),
                          fp8.from8(f, p8.z))

    if stage == "sweep":
        return to_u32_proj(P8(buckets.x[:, 0], buckets.y[:, 0],
                              buckets.z[:, 0]))

    # log-depth weighted aggregation: sum_{v>=1} v*B_v = sum_k S_k with
    # S_k = sum_{v>=k} B_v (suffix sums via one associative scan over the
    # bucket axis + a tree sum) — see ops/msm.py for the rationale
    bpos = P8(buckets.x[:, :, 1:], buckets.y[:, :, 1:], buckets.z[:, :, 1:])
    rev = P8(bpos.x[..., ::-1], bpos.y[..., ::-1], bpos.z[..., ::-1])
    suf = jax.lax.associative_scan(
        lambda p, q: add8(curve, p, q), rev, axis=2)
    m_ax = nb - 1
    pts_agg = suf
    while m_ax > 1:
        half_ax = m_ax // 2
        left = P8(*(t[..., :half_ax] for t in pts_agg))
        right = P8(*(t[..., half_ax:2 * half_ax] for t in pts_agg))
        summed = add8(curve, left, right)
        if m_ax % 2:
            summed = P8(*(jnp.concatenate([a, b[..., -1:]], axis=-1)
                          for a, b in zip(summed, pts_agg)))
            m_ax = half_ax + 1
        else:
            m_ax = half_ax
        pts_agg = summed
    window_sums = P8(pts_agg.x[..., 0], pts_agg.y[..., 0], pts_agg.z[..., 0])
    if stage == "agg":
        return to_u32_proj(window_sums)

    # overflow window (k+r recode carry): masked tree-sum of the flagged
    # points as a 2^256-weighted extra window (c * W == 256 doublings)
    n_win = w
    if overflow is not None:
        f = curve.fq
        one8v = fp8.one(f, (n,))
        live = (overflow & ~points.inf)[None, :]
        sx = jnp.where(live, px[:, :n], 0.0)
        sy = jnp.where(live, py[:, :n], one8v)
        sz = jnp.where(live, one8v, jnp.zeros_like(one8v))
        spts = P8(sx, sy, sz)
        m_s = n
        while m_s > 1:
            half_s = m_s // 2
            left = P8(*(a[:, :half_s] for a in spts))
            right = P8(*(a[:, half_s:2 * half_s] for a in spts))
            summed = add8(curve, left, right)
            if m_s % 2:
                summed = P8(*(jnp.concatenate([a, b[:, -1:]], 1)
                              for a, b in zip(summed, spts)))
                m_s = half_s + 1
            else:
                m_s = half_s
            spts = summed
        window_sums = P8(*(jnp.concatenate([a, b[:, :1]], axis=1)
                           for a, b in zip(window_sums, spts)))
        n_win = w + 1

    total_dbl = c * (n_win - 1)
    DBL_UNROLL = DBL_UNROLL_N
    win_idx = jnp.arange(n_win)

    def dbl_body(acc, i_base):
        for t in range(DBL_UNROLL):
            i = i_base + t
            mask = i < (c * win_idx)
            acc = where8(mask, dbl8(curve, acc), acc)
        return acc, None

    n_steps = (total_dbl + DBL_UNROLL - 1) // DBL_UNROLL
    acc, _ = jax.lax.scan(dbl_body, window_sums,
                          jnp.arange(n_steps) * DBL_UNROLL)
    m = n_win
    pts = acc
    while m > 1:
        half = m // 2
        left = P8(*(a[:, :half] for a in pts))
        right = P8(*(a[:, half:2 * half] for a in pts))
        summed = add8(curve, left, right)
        if m % 2:
            summed = P8(*(jnp.concatenate([a, b[:, -1:]], 1)
                          for a, b in zip(summed, pts)))
            m = half + 1
        else:
            m = half
        pts = summed
    return to_u32_proj(P8(pts.x[:, 0], pts.y[:, 0], pts.z[:, 0]))


def msm8(curve: CurveSpec, points: Affine, scalars_mont, c: int = 8,
         s: int = None):
    """Full MSM via the f32 bucket phase (host-synced slot bound unless
    a static s is supplied).  Signed digits + the sort-free rank path: the
    slot scatter only needs (magnitude, sign, rank) per point, with the
    identity permutation as scatter values."""
    from . import msm as msm_mod
    from ..curves import weierstrass as wst
    if 256 % c != 0:
        raise ValueError("window size c must divide 256")
    mag, signs, ranks, overflow, wmaxes = msm_mod._signed_digits_and_ranks(
        curve, scalars_mont, c)
    if s is None:
        s = int(jnp.max(wmaxes))
        if s == 0:
            return wst.projective_zero(curve, ())
        s = msm_mod._quantize_slots(s, points.x.shape[0])
    n = points.x.shape[0]
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mag.shape)
    return bucket_phase8(curve, points, mag, (perm, ranks), c, s,
                         signs=signs, signed=True, overflow=overflow)
