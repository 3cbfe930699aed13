"""Fused on-device IPA opening prover (the flagship ⟵⟵HOT path).

The host-orchestrated `pc/ipa_pc.open` pays one device→host→device round
trip per folding round to run the Fiat-Shamir sponge on the host: absorb the
round's l/r cross commitments, squeeze the challenge, feed it back.  On the
relay-latency-bound axon backend those log(n) synchronisations dominate the
prover's non-compute cost (reference hot path:
/root/reference/src/ipa_pc_as/mod.rs:424-472 `IpaPC::open...`).

This module runs the identical transcript on the device sponge
(jit/sponge_device.py implements the exact ops/sponge.py encoding spec):

  * `_prologue`  — one jitted graph: powers of the evaluation point, the
    claimed value <coeffs, powers>, the absorb/squeeze prologue, U = xi_0*h;
  * `_round`     — one jitted graph per folding size L: the two cross-term
    MSMs, the l/r absorb + challenge squeeze, the a/b/G folds, and the G
    re-normalisation, with zero host synchronisation;
  * `open_fused` — the host driver: k async dispatches, ONE readback at the
    end (which doubles as the completion barrier and the MSM slot-overflow
    check).

The in-round MSMs cannot host-sync their Pippenger slot bound, so they use a
static bound sized for the (pseudo-random) folded scalar distribution and
return an overflow flag; on the (cryptographically unlikely) overflow the
driver falls back to the host-sponge path, so results are always exact.

Transcript equivalence with the host path is asserted in
tests/test_jit_pipeline.py (identical Proof for identical inputs).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec, Projective
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE
from ..ops import msm as msm_mod
from ..ops import poly as poly_ops
from ..ops.sponge import PoseidonSponge, domain_sponge, IPA_PC_DOMAIN
from .sponge_device import DeviceSponge

CHALLENGE_SIZE = 128

# All folding rounds with L <= TAIL_MAX fuse into a handful of jitted
# graphs (`_tail_group`): at degree 2^20 the open otherwise needs one
# remote compile per
# round (k ~= 20 graphs, 40-400 s each cold — CLAUDE.md), and the small
# rounds are all compile cost and no work.  Platform-aware default: the
# XLA:CPU test backend keeps the tail tiny so the suite covers BOTH the
# per-round and the fused-tail paths at the reference test degrees.
_ON_CPU = "cpu" in os.environ.get("JAX_PLATFORMS", "")
# TPU default 1024 (was 2048): the L=2048 single-round tail group — a
# vmapped cross-term MSM PAIR + fold + 256-step scalar scan fused in one
# graph — reproducibly OOM-SIGKILLs the 2026-08-20 deployment's remote
# compile helper (~17-min hang then death; it was r04's unidentified
# bench killer — experiments/r05/prewarm16.log, two kills at 19:11 and
# 22:05).  At TAIL_MAX=1024 that round runs through the SPLIT
# _round_msms/_round_fold path instead (padded into the 4096 pivot set,
# which the helper compiles fine), the round plan keeps the same three
# pivot graph sets at n=2^16, and every smaller tail-group graph is one
# the helper has already survived.
TAIL_MAX = int(os.environ.get("ACCUM_TPU_FUSED_TAIL_MAX",
                              "8" if _ON_CPU else "1024"))
# The tail is further chunked into groups of <= TAIL_GROUP rounds per
# jitted graph: one graph holding ALL ~11 tail rounds at TAIL_MAX=2048
# OOM-SIGKILLed the memory-constrained remote TPU compile helper (r04
# bench_s16c ipa_as_error; the same graph is also XLA:CPU's slowest
# compile at ~15 min — jit__tail in r04 logs).  Grouping trades one
# monster compile for ceil(11/G) medium ones whose peak compiler RSS the
# helper survives.  A 4-round group (1.1 MB of MLIR) STILL SIGKILLed the
# helper (experiments/r04/prewarm16_s3b.log), so the TPU default is now 1
# round per graph — ~11 small compiles; the per-round graphs are the only
# tail shape proven to get through this deployment's helper.  CPU default
# 2 so the test suite exercises the group-boundary state threading.
TAIL_GROUP = max(1, int(os.environ.get("ACCUM_TPU_FUSED_TAIL_GROUP",
                                       "2" if _ON_CPU else "1")))


def _pow2ceil(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _slot_bound(L: int, c: int) -> int:
    """Static Pippenger slot bound for the BULK windows of L pseudo-random
    scalars, window c (signed digits: magnitudes uniform over 2^(c-1)
    buckets per window).

    Bucket occupancy is ~Poisson(mu = L/2^(c-1)); mu + 8*sqrt(mu) + 16
    holds with overwhelming margin across the bulk windows.  The TOP k+r
    window is NOT uniform — its occupancy concentrates at ~2.0x the bulk
    mean (measured 543 vs ~306 at L=2048/c=4, r05) — so the static sweep
    splits it into STATIC_TOP_REPS replica rows of this bulk depth
    (`_static_sweep`, the in-graph analog of ops.msm._plan_split).
    Overflow of either bound is still *detected*, never assumed away."""
    mu = max(1, L >> (c - 1))
    s = mu + 8 * int(mu ** 0.5) + 16
    return min(_pow2ceil(s), L)


# replica rows for the concentrated top window: its measured max (~2.0x
# the bulk mean + Poisson tail) always fits 2 rows of the bulk bound,
# which itself is >= 2x the bulk mean after _pow2ceil.  Until r05 the
# static path used ONE shared bound — the top window exceeded it
# deterministically for halves >= 1024, so every big fused round silently
# fell back to the host prover (the r05 safe-pass bench's 2 h mystery).
STATIC_TOP_REPS = 2


def _static_sweep(curve: CurveSpec, pts: Affine, mag, signs, ranks,
                  overflow, wmaxes, c: int, s: int):
    """The fused rounds' bucket sweep with the STATIC top-window split:
    bulk windows at depth `s`, the hot top window as STATIC_TOP_REPS
    replica rows of the same depth (ops.msm._split_hot_window is pure jnp,
    so the split lives in-graph — only the slot-bound *measurement* needed
    a host sync, and the static bounds replace that).  Returns
    (Projective, overflow_flag); the flag covers both bounds."""
    w = mag.shape[-2]
    perm = jnp.broadcast_to(
        jnp.arange(mag.shape[-1], dtype=jnp.int32), mag.shape)
    if w < 2:
        out = msm_mod._bucket_phase(curve, pts, mag, (perm, ranks), c, s,
                                    signs=signs, signed=True,
                                    overflow=overflow)
        return out, jnp.max(wmaxes) > s
    mag2, signs2, ranks2 = msm_mod._split_hot_window(
        mag, signs, ranks, s, STATIC_TOP_REPS)
    perm2 = jnp.broadcast_to(
        jnp.arange(mag2.shape[-1], dtype=jnp.int32), mag2.shape)
    dbl_counts = tuple(c * i for i in range(w - 1)) \
        + (c * (w - 1),) * STATIC_TOP_REPS
    out = msm_mod._bucket_phase(curve, pts, mag2, (perm2, ranks2), c, s,
                                signs=signs2, signed=True, overflow=overflow,
                                dbl_counts=dbl_counts)
    flag = (jnp.max(wmaxes[..., :-1]) > s) \
        | (wmaxes[..., -1] > STATIC_TOP_REPS * s)
    return out, flag


def _msm_static(curve: CurveSpec, pts: Affine, scalars, c: int, s: int):
    """Jit-safe MSM: no host sync; returns (Projective, overflow_flag)."""
    L = pts.x.shape[0]
    if L <= msm_mod.SMALL_N_THRESHOLD:
        return wst.msm_bitserial(curve, pts, scalars), jnp.asarray(False)
    mag, signs, ranks, overflow, wmaxes = \
        msm_mod._signed_digits_and_ranks(curve, scalars, c)
    if msm_mod._use_fp8_engine():
        from ..ops import msm8
        perm = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), mag.shape)
        out = msm8.bucket_phase8(curve, pts, mag, (perm, ranks), c, s,
                                 signs=signs, signed=True, overflow=overflow)
        return out, jnp.max(wmaxes) > s
    return _static_sweep(curve, pts, mag, signs, ranks, overflow, wmaxes,
                         c, s)


# a folding round's MSM shards over an active mesh only when each shard
# keeps at least this many points (below it the all-gather + replicated
# epilogue costs more than the sharded sweep saves)
MESH_MIN_LOCAL = 16


def _mesh_shardable(mesh, L: int) -> bool:
    return (mesh is not None and mesh.devices.size > 1
            and L % mesh.devices.size == 0
            and L // mesh.devices.size >= MESH_MIN_LOCAL)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_static_pair(curve: CurveSpec, pts2: Affine, scalars2, c: int,
                     s: int):
    """The round's TWO equal-size cross-term MSMs as ONE vmapped graph.

    pts2: (2, L) Affine, scalars2: (2, L, NLIMBS).  vmap widens tensors
    instead of duplicating ops, so the jitted round keeps the HLO volume of
    a single MSM — two separate `_msm_static` subgraphs in one graph
    OOM-killed the remote TPU compile helper at L = 2^19 (round-3
    prewarm).  Same batched structure as `ops.msm.msm_batched`.
    Falls back to two sequential calls for the opt-in non-u32 engines."""
    L = pts2.x.shape[1]
    lo = Affine(pts2.x[0], pts2.y[0], pts2.inf[0])
    hi = Affine(pts2.x[1], pts2.y[1], pts2.inf[1])
    if L <= msm_mod.SMALL_N_THRESHOLD:
        out = jax.vmap(
            lambda px, py, pinf, sc: wst.msm_bitserial(
                curve, Affine(px, py, pinf), sc))(
            pts2.x, pts2.y, pts2.inf, scalars2)
        return out, jnp.zeros((2,), bool)
    if msm_mod._use_fp8_engine():
        o0, f0 = _msm_static(curve, lo, scalars2[0], c, s)
        o1, f1 = _msm_static(curve, hi, scalars2[1], c, s)
        return (Projective(jnp.stack([o0.x, o1.x]), jnp.stack([o0.y, o1.y]),
                           jnp.stack([o0.z, o1.z])),
                jnp.stack([f0, f1]))

    def one(px, py, pinf, scalars):
        pts = Affine(px, py, pinf)
        mag, signs, ranks, overflow, wmaxes = \
            msm_mod._signed_digits_and_ranks(curve, scalars, c)
        return _static_sweep(curve, pts, mag, signs, ranks, overflow,
                             wmaxes, c, s)

    return jax.vmap(one)(pts2.x, pts2.y, pts2.inf, scalars2)


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _msm_static_pair_sharded(curve: CurveSpec, mesh, pts2: Affine, scalars2,
                             c: int, s: int):
    """`_msm_static_pair` with the point axis sharded over `mesh`; the
    batch axis of 2 is replicated.  `s` is the PER-SHARD slot bound."""
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def fn(px, py, pinf, sc):
        local, of = _msm_static_pair(curve, Affine(px, py, pinf), sc, c, s)
        gx = jax.lax.all_gather(local.x, axes, axis=1)
        gy = jax.lax.all_gather(local.y, axes, axis=1)
        gz = jax.lax.all_gather(local.z, axes, axis=1)
        # gathered shape: (2, n_dev, NLIMBS)
        # (2, D, NLIMBS) -> tree-add over the device axis per batch row
        total = jax.vmap(
            lambda x, y, z: wst._tree_reduce(curve, Projective(x, y, z))
        )(gx, gy, gz)
        of_any = jax.lax.pmax(of.astype(jnp.int32), axes) > 0
        return total.x, total.y, total.z, of_any

    x, y, z, of = jax.shard_map(
        fn, mesh=mesh, check_vma=False,
        in_specs=(P(None, axes, None), P(None, axes, None), P(None, axes),
                  P(None, axes, None)),
        out_specs=(P(), P(), P(), P()),
    )(pts2.x, pts2.y, pts2.inf, scalars2)
    return Projective(x, y, z), of


def _inner_product(curve: CurveSpec, a, b):
    fr = curve.fr
    prods = fp.mul(fr, a, b)
    n = prods.shape[0]
    while n > 1:
        half = n // 2
        s = fp.add(fr, prods[:half], prods[half:half * 2])
        if n % 2:
            s = jnp.concatenate([s, prods[-1:]], axis=0)
            n = half + 1
        else:
            n = half
        prods = s
    return prods[0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _prologue(curve: CurveSpec, n: int, has_rand: bool, pm,
              state, coeffs, comm: Affine, point, rand):
    """Transcript prologue + claimed value + U.  Returns
    (state', b_powers, value, u_projective)."""
    fr, fq = curve.fr, curve.fq
    sp = DeviceSponge(fq)
    sp.state, sp.mode, sp.pos = state, pm[0], pm[1]

    b = poly_ops.powers(fr, point, n)          # (n, L)
    value = _inner_product(curve, coeffs, b)   # p(point)

    sp.absorb_point(comm)
    sp.absorb_nonnative(fr, point)
    sp.absorb_nonnative(fr, value)
    if has_rand:
        sp.absorb_nonnative(fr, rand)
    xi0 = sp.squeeze_fr_truncated(fr, CHALLENGE_SIZE)
    return sp.state, b, value, xi0


# Pivot sizes: big rounds zero-pad up to a pivot so several fold sizes
# SHARE one compiled (digits, sweep, fold) graph set.  The remote TPU
# compile of one set runs 30-90 min at big L and is op-count-bound
# (size-independent), so 9 per-size sets would cost many hours; the
# power-of-4 default cuts that to 5 for ~1.33x msm-stage work (odd-power
# rounds run at double size).  ACCUM_TPU_FUSED_PIVOTS="1048576,..." pins
# an explicit ascending pivot list (e.g. a single pivot = ONE graph set
# for every big round: maximum compile reuse, ~2x msm-stage work at
# 2^20).  Padding is transcript-neutral: zero scalars never enter a
# bucket, infinity points are absorbed by the complete formulas, and the
# absorbed l/r values are unchanged.
_PIVOTS = tuple(sorted(
    int(x) for x in os.environ.get("ACCUM_TPU_FUSED_PIVOTS", "").split(",")
    if x.strip()))


def _pivot(L: int, n: int) -> int:
    """Smallest configured pivot >= L (power of 4 by default), clamped to
    the key length n (padding past the key buys nothing)."""
    for p in _PIVOTS:
        if p >= L:
            return min(p, n)
    p = 1
    while p < L:
        p <<= 2
    return min(p, n)


def round_plan(n: int, mesh=None):
    """Static per-round (L, Lp, cwin, slot_bound) schedule for an open at
    key length n, split into (big_rounds, tail_rounds): big rounds run at
    the padded pivot size Lp (graph set shared across rounds with equal
    Lp), tail rounds fuse into a single graph.  When a round's MSMs shard
    over `mesh` (_mesh_shardable), the slot bound is sized for the
    PER-SHARD point count."""
    k = n.bit_length() - 1
    n_dev = mesh.devices.size if mesh is not None else 1
    big, tail = [], []
    for i in range(k):
        L = n >> i
        if L <= TAIL_MAX:
            half = L // 2
            n_eff = half // n_dev if _mesh_shardable(mesh, half) else half
            cwin = msm_mod._pick_c(n_eff)
            tail.append((L, cwin, _slot_bound(n_eff, cwin)))
        else:
            Lp = _pivot(L, n)
            half = Lp // 2
            n_eff = half // n_dev if _mesh_shardable(mesh, half) else half
            cwin = msm_mod._pick_c(n_eff)
            big.append((L, Lp, cwin, _slot_bound(n_eff, cwin)))
    return tuple(big), tuple(tail)


def _pad_round_state(curve: CurveSpec, a, b, g: Affine, L: int, Lp: int):
    """Zero-pad (a, b, g) from L to pivot size Lp, padding EACH HALF so the
    graph's lo/hi split at Lp/2 hits the real halves: [x_lo 0.. x_hi 0..]."""
    if L == Lp:
        return a, b, g
    half, halfp = L // 2, Lp // 2
    zpad = jnp.zeros((halfp - half, NLIMBS), DTYPE)
    inf = wst.affine_zero(curve, (halfp - half,))

    def padv(v):
        return jnp.concatenate([v[:half], zpad, v[half:], zpad], axis=0)

    a2, b2 = padv(a), padv(b)
    g2 = Affine(
        jnp.concatenate([g.x[:half], inf.x, g.x[half:], inf.x], axis=0),
        jnp.concatenate([g.y[:half], inf.y, g.y[half:], inf.y], axis=0),
        jnp.concatenate([g.inf[:half], inf.inf, g.inf[half:], inf.inf],
                        axis=0),
    )
    return a2, b2, g2


def _round_body(curve: CurveSpec, cwin: int, s: int, sp: DeviceSponge,
                a, b, g: Affine, u: Projective, mesh=None):
    """One folding round's math, tracing into the caller's graph.  The
    sponge `sp` is threaded through (absorb l/r, squeeze xi).  Returns
    (l_aff, r_aff, a', b', g'_affine, overflow)."""
    fr = curve.fr
    L = a.shape[0]
    half = L // 2

    a_lo, a_hi = a[:half], a[half:]
    b_lo, b_hi = b[:half], b[half:]
    g_lo = Affine(g.x[:half], g.y[:half], g.inf[:half])
    g_hi = Affine(g.x[half:], g.y[half:], g.inf[half:])

    ip_l = _inner_product(curve, a_hi, b_lo)
    ip_r = _inner_product(curve, a_lo, b_hi)
    pts2 = Affine(jnp.stack([g_lo.x, g_hi.x]), jnp.stack([g_lo.y, g_hi.y]),
                  jnp.stack([g_lo.inf, g_hi.inf]))
    sc2 = jnp.stack([a_hi, a_lo])
    if _mesh_shardable(mesh, half):
        m2, of2 = _msm_static_pair_sharded(curve, mesh, pts2, sc2, cwin, s)
    else:
        m2, of2 = _msm_static_pair(curve, pts2, sc2, cwin, s)
    ml = Projective(m2.x[0], m2.y[0], m2.z[0])
    mr = Projective(m2.x[1], m2.y[1], m2.z[1])
    of_l, of_r = of2[0], of2[1]
    l_pt = wst.proj_add(curve, ml, wst.scalar_mul(curve, u, ip_l))
    r_pt = wst.proj_add(curve, mr, wst.scalar_mul(curve, u, ip_r))
    lr = wst.to_affine(curve, Projective(
        jnp.stack([l_pt.x, r_pt.x]), jnp.stack([l_pt.y, r_pt.y]),
        jnp.stack([l_pt.z, r_pt.z])))
    l_aff = Affine(lr.x[0], lr.y[0], lr.inf[0])
    r_aff = Affine(lr.x[1], lr.y[1], lr.inf[1])

    sp.absorb_point(l_aff)
    sp.absorb_point(r_aff)
    xi = sp.squeeze_fr_truncated(fr, CHALLENGE_SIZE)
    xi_inv = fp.inv(fr, xi)

    a2 = fp.add(fr, a_lo, fp.mul(fr, a_hi, xi[None, :]))
    b2 = fp.add(fr, b_lo, fp.mul(fr, b_hi, xi_inv[None, :]))
    xi_inv_bits = fp.canonical_bits(fr, xi_inv, 256)
    g2 = _fold_g(curve, g_lo, g_hi, xi_inv_bits)
    return l_aff, r_aff, a2, b2, g2, of_l | of_r


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _half_sweep(curve: CurveSpec, cwin: int, s: int, pts: Affine,
                mag, signs, ranks, of, wm):
    """One cross-term bucket phase (static top-window split); flags
    overflow of either static bound."""
    return _static_sweep(curve, pts, mag, signs, ranks, of, wm, cwin, s)


def _round_msms(curve: CurveSpec, cwin: int, s: int, mesh, a, g: Affine):
    """Heavy half of a big folding round: the two cross-term MSMs, each as
    TWO jitted dispatches (the shipped digits+ranks graph, then the bucket
    sweep) with zero host readbacks — `s` is static, so nothing needs a
    host sync.  Returns (m2 (2,)-batched Projective, of2 (2,) bools).

    Graph granularity is load-bearing (round-3 prewarm, v5e): one graph
    holding digits AND sweep at L = 2^20 OOM-kills the remote compile
    helper, and a vmapped (2, L/2) pair — though it compiles — crashes
    the TPU worker process at RUN time ("kernel fault").  Two sequential
    dispatches of the unbatched graphs are exactly the shipped
    `ops.msm.msm` execution shape, which runs at 2^20 in production."""
    L = a.shape[0]
    half = L // 2
    g_lo = Affine(g.x[:half], g.y[:half], g.inf[:half])
    g_hi = Affine(g.x[half:], g.y[half:], g.inf[half:])
    if _mesh_shardable(mesh, half):
        pts2 = Affine(jnp.stack([g_lo.x, g_hi.x]), jnp.stack([g_lo.y, g_hi.y]),
                      jnp.stack([g_lo.inf, g_hi.inf]))
        sc2 = jnp.stack([a[half:], a[:half]])
        return _msm_static_pair_sharded(curve, mesh, pts2, sc2, cwin, s)
    if half <= msm_mod.SMALL_N_THRESHOLD \
            or msm_mod._use_fp8_engine():
        pts2 = Affine(jnp.stack([g_lo.x, g_hi.x]), jnp.stack([g_lo.y, g_hi.y]),
                      jnp.stack([g_lo.inf, g_hi.inf]))
        sc2 = jnp.stack([a[half:], a[:half]])
        return _msm_static_pair(curve, pts2, sc2, cwin, s)

    def one(pts, sc):
        mag, signs, ranks, of, wm = \
            msm_mod._signed_digits_and_ranks(curve, sc, cwin)
        return _half_sweep(curve, cwin, s, pts, mag, signs, ranks, of, wm)

    ml, fl = one(g_lo, a[half:])
    mr, fr = one(g_hi, a[:half])
    m2 = Projective(jnp.stack([ml.x, mr.x]), jnp.stack([ml.y, mr.y]),
                    jnp.stack([ml.z, mr.z]))
    return m2, jnp.stack([fl, fr])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _round_fold(curve: CurveSpec, pm, state, a, b, g: Affine, u: Projective,
                m2: Projective):
    """Light half of a big folding round: L/R assembly (+ u * <a,b> cross
    inner products), transcript absorb/squeeze, and the a/b/G folds.
    Returns (state', l_aff, r_aff, a', b', g'_affine)."""
    fr = curve.fr
    sp = DeviceSponge(curve.fq)
    sp.state, sp.mode, sp.pos = state, pm[0], pm[1]
    L = a.shape[0]
    half = L // 2
    a_lo, a_hi = a[:half], a[half:]
    b_lo, b_hi = b[:half], b[half:]
    g_lo = Affine(g.x[:half], g.y[:half], g.inf[:half])
    g_hi = Affine(g.x[half:], g.y[half:], g.inf[half:])

    ip_l = _inner_product(curve, a_hi, b_lo)
    ip_r = _inner_product(curve, a_lo, b_hi)
    ml = Projective(m2.x[0], m2.y[0], m2.z[0])
    mr = Projective(m2.x[1], m2.y[1], m2.z[1])
    l_pt = wst.proj_add(curve, ml, wst.scalar_mul(curve, u, ip_l))
    r_pt = wst.proj_add(curve, mr, wst.scalar_mul(curve, u, ip_r))
    lr = wst.to_affine(curve, Projective(
        jnp.stack([l_pt.x, r_pt.x]), jnp.stack([l_pt.y, r_pt.y]),
        jnp.stack([l_pt.z, r_pt.z])))
    l_aff = Affine(lr.x[0], lr.y[0], lr.inf[0])
    r_aff = Affine(lr.x[1], lr.y[1], lr.inf[1])

    sp.absorb_point(l_aff)
    sp.absorb_point(r_aff)
    xi = sp.squeeze_fr_truncated(fr, CHALLENGE_SIZE)
    xi_inv = fp.inv(fr, xi)

    a2 = fp.add(fr, a_lo, fp.mul(fr, a_hi, xi[None, :]))
    b2 = fp.add(fr, b_lo, fp.mul(fr, b_hi, xi_inv[None, :]))
    xi_inv_bits = fp.canonical_bits(fr, xi_inv, 256)
    g2 = _fold_g(curve, g_lo, g_hi, xi_inv_bits)
    return sp.state, l_aff, r_aff, a2, b2, g2


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _tail_group(curve: CurveSpec, plans, pm, mesh, state, a, b, g: Affine,
                u: Projective):
    """A group of <= TAIL_GROUP consecutive small folding rounds
    (L <= TAIL_MAX) fused into ONE graph: the small rounds are
    compile-latency-bound, not work-bound, so fusing them cuts remote
    compiles from ~log2(TAIL_MAX) to ceil(.../TAIL_GROUP) — while keeping
    each graph small enough for the remote compile helper (see TAIL_GROUP
    note).  The duplex schedule is identical every round, so every group
    boundary sits at sponge (mode, pos) = pm and only the traced state
    threads through.  Returns (state', l_stack, r_stack, a', b', g',
    overflow_any)."""
    sp = DeviceSponge(curve.fq)
    sp.state, sp.mode, sp.pos = state, pm[0], pm[1]
    ls, rs, flags = [], [], []
    for (_L, cwin, s) in plans:
        l_aff, r_aff, a, b, g, of = _round_body(
            curve, cwin, s, sp, a, b, g, u, mesh=mesh)
        ls.append(l_aff)
        rs.append(r_aff)
        flags.append(of)
    from ..schemes import common as scommon
    return (sp.state, scommon.stack_affine(ls), scommon.stack_affine(rs),
            a, b, g, jnp.any(jnp.stack(flags)))


def _fold_g(curve: CurveSpec, g_lo: Affine, g_hi: Affine, xi_inv_bits):
    """G' = G_lo + xi_inv * G_hi, renormalised to affine for the next round's
    mixed-add MSM.  Batched 256-step double-and-add over the hi lanes."""
    hi_p = wst.from_affine(curve, g_hi)

    def body(acc, i):
        acc = wst._dbl_raw(curve, acc)
        bit = xi_inv_bits[255 - i]
        added = wst._add_raw(curve, acc, hi_p)
        take = jnp.full(hi_p.z.shape[:-1], True) & (bit == 1)
        acc = wst._where_pt(take, added, acc)
        return acc, None

    init = wst.projective_zero(curve, hi_p.z.shape[:-1])
    mult, _ = jax.lax.scan(body, init, jnp.arange(256))
    summed = wst._add_raw(curve, mult, wst.from_affine(curve, g_lo))
    return wst.to_affine(curve, summed)


def open_fused(curve: CurveSpec, ck, coeffs, comm: Affine, point,
               rand=None, sponge: Optional[PoseidonSponge] = None):
    """Drop-in for `ipa_pc.open` (non-hiding): identical Proof, one readback.

    ck: ipa_pc.CommitterKey.  Falls back to the host path if a static MSM
    slot bound overflowed (exact detection, never silent)."""
    from ..pc import ipa_pc
    from ..schemes import common as scommon

    fr, fq = curve.fr, curve.fq
    host_sp = sponge or domain_sponge(fq, IPA_PC_DOMAIN)

    n = ck.comm_key.x.shape[0]
    n0 = coeffs.shape[0]
    assert n0 <= n, "polynomial degree exceeds committer key"
    if n0 < n:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((n - n0, NLIMBS), DTYPE)], axis=0)
    k = n.bit_length() - 1

    state = fp.array_from_ints(fq, host_sp.state)
    pm = (host_sp.mode, host_sp.pos)
    has_rand = rand is not None
    rand_in = rand if has_rand else jnp.zeros((NLIMBS,), DTYPE)

    state, b, value, xi0 = _prologue(
        curve, n, has_rand, pm, state, coeffs, comm, point, rand_in)
    u = wst.scalar_mul(curve, wst.from_affine(curve, ck.h), xi0)

    # transparent multi-chip dispatch: big rounds' MSMs shard over an
    # active context mesh (round-2 verdict weak #5); rounds too small to
    # shard — including the whole fused tail by construction — stay
    # single-device (the all-gather would cost more than the local sweep)
    from ..parallel import context as par_context
    mesh = par_context.get_mesh()

    a = coeffs
    g = ck.comm_key
    big, tail = round_plan(n, mesh)
    ls, rs, flags = [], [], []
    for (L, Lp, cwin, s) in big:
        # pad to the pivot size (graph reuse, _pivot), run the round as
        # three device dispatches (digits, sweep, fold) composed on the
        # host with no readbacks, then slice the fold output back
        a, b, g = _pad_round_state(curve, a, b, g, L, Lp)
        m2, of2 = _round_msms(curve, cwin, s, mesh, a, g)
        state, l_aff, r_aff, a, b, g = _round_fold(
            curve, ("squeeze", 1), state, a, b, g, u, m2)
        half = L // 2
        if Lp != L:
            a, b = a[:half], b[:half]
            g = Affine(g.x[:half], g.y[:half], g.inf[:half])
        ls.append(l_aff)
        rs.append(r_aff)
        flags.append(jnp.any(of2))

    if tail:
        tail_ls, tail_rs = [], []
        for i in range(0, len(tail), TAIL_GROUP):
            state, gl, gr, a, b, g, of_g = _tail_group(
                curve, tail[i:i + TAIL_GROUP], ("squeeze", 1), mesh,
                state, a, b, g, u)
            tail_ls.append(gl)
            tail_rs.append(gr)
            flags.append(of_g)
        l_stack = scommon.cat_affine(tail_ls)
        r_stack = scommon.cat_affine(tail_rs)
        c_final = a[0]
        final_g = Affine(g.x[0], g.y[0], g.inf[0])
    else:
        l_stack = r_stack = None
        c_final = a[0]
        final_g = Affine(g.x[0], g.y[0], g.inf[0])

    if ls and l_stack is not None:
        l_vec = scommon.cat_affine([scommon.stack_affine(ls), l_stack])
        r_vec = scommon.cat_affine([scommon.stack_affine(rs), r_stack])
    elif l_stack is not None:
        l_vec, r_vec = l_stack, r_stack
    elif ls:
        l_vec = scommon.stack_affine(ls)
        r_vec = scommon.stack_affine(rs)
    else:
        l_vec = r_vec = wst.affine_zero(curve, (0,))
    proof = ipa_pc.Proof(
        l_vec=l_vec,
        r_vec=r_vec,
        final_comm_key=final_g,
        c=c_final,
        hiding_comm=None,
        rand=rand,
    )
    overflow = bool(np.asarray(jnp.any(jnp.stack(flags)))) if flags else False
    if overflow:
        # statically-bounded Pippenger slots overflowed (≈ never for
        # pseudo-random folds) — recompute exactly on the host path.
        # LOUD on purpose: a spurious flag here silently downgrades the
        # flagship prover to the host path (its ~log n per-round graphs
        # dominated the r05 safe-pass bench before this was visible)
        import sys
        per_round = [int(x) for x in np.asarray(
            jnp.stack([jnp.any(f) for f in flags])).astype(int)]
        print(f"[open_fused] n={n}: static slot bound OVERFLOW "
              f"(per-round flags {per_round}) — falling back to the host "
              "prover", file=sys.stderr, flush=True)
        return ipa_pc.open_host(
            curve, ck, coeffs[:n0], comm, point, rand=rand, hiding=False,
            sponge=(sponge.clone() if sponge is not None else None))
    return proof
