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

# All folding rounds with L <= TAIL_MAX fuse into ONE jitted graph
# (`_tail`): at degree 2^20 the open otherwise needs one remote compile per
# round (k ~= 20 graphs, 40-400 s each cold — CLAUDE.md), and the small
# rounds are all compile cost and no work.  Platform-aware default: the
# XLA:CPU test backend keeps the tail tiny so the suite covers BOTH the
# per-round and the fused-tail paths at the reference test degrees.
_ON_CPU = "cpu" in os.environ.get("JAX_PLATFORMS", "")
TAIL_MAX = int(os.environ.get("ACCUM_TPU_FUSED_TAIL_MAX",
                              "8" if _ON_CPU else "2048"))


def _pow2ceil(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _slot_bound(L: int, c: int) -> int:
    """Static Pippenger slot bound for L pseudo-random scalars, window c
    (signed digits: magnitudes uniform over 2^(c-1) buckets per window).

    Bucket occupancy is ~Poisson(mu = L/2^(c-1)); mu + 8*sqrt(mu) + 16 holds
    with overwhelming margin across all w*2^(c-1) buckets.  Overflow is
    still *detected* (not assumed away) — see `_msm_static`."""
    mu = max(1, L >> (c - 1))
    s = mu + 8 * int(mu ** 0.5) + 16
    return min(_pow2ceil(s), L)


def _msm_static(curve: CurveSpec, pts: Affine, scalars, c: int, s: int):
    """Jit-safe MSM: no host sync; returns (Projective, overflow_flag)."""
    L = pts.x.shape[0]
    if L <= msm_mod.SMALL_N_THRESHOLD:
        return wst.msm_bitserial(curve, pts, scalars), jnp.asarray(False)
    mag, signs, ranks, overflow, wmaxes = \
        msm_mod._signed_digits_and_ranks(curve, scalars, c)
    perm = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), mag.shape)
    if msm_mod._use_fp8_engine():
        from ..ops import msm8
        out = msm8.bucket_phase8(curve, pts, mag, (perm, ranks), c, s,
                                 signs=signs, signed=True, overflow=overflow)
    elif msm_mod._use_lane_engine():
        from ..ops import msm_lanes
        out = msm_lanes.bucket_phase_lanes(
            curve, pts, mag, (perm, ranks), c, s,
            signs=signs, signed=True, overflow=overflow)
    else:
        out = msm_mod._bucket_phase(curve, pts, mag, (perm, ranks), c, s,
                                    signs=signs, signed=True,
                                    overflow=overflow)
    return out, jnp.max(wmaxes) > s


# a folding round's MSM shards over an active mesh only when each shard
# keeps at least this many points (below it the all-gather + replicated
# epilogue costs more than the sharded sweep saves)
MESH_MIN_LOCAL = 16


def _mesh_shardable(mesh, L: int) -> bool:
    return (mesh is not None and mesh.devices.size > 1
            and L % mesh.devices.size == 0
            and L // mesh.devices.size >= MESH_MIN_LOCAL)


def _msm_static_sharded(curve: CurveSpec, mesh, pts: Affine, scalars,
                        c: int, s: int):
    """`_msm_static` with the point axis sharded over `mesh` (1-D or the
    hierarchical ("dcn","ici") grid): per-shard static bucket phase / bit-
    serial kernel, one all_gather of the partial sums + local tree add,
    overflow flags OR-reduced over the mesh.  `s` must be the PER-SHARD
    slot bound (round_plan sizes it for L/(2*n_dev) points)."""
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def fn(px, py, pinf, sc):
        local, of = _msm_static(curve, Affine(px, py, pinf), sc, c, s)
        gx = jax.lax.all_gather(local.x, axes)
        gy = jax.lax.all_gather(local.y, axes)
        gz = jax.lax.all_gather(local.z, axes)
        total = wst._tree_reduce(curve, Projective(gx, gy, gz))
        of_any = jax.lax.pmax(of.astype(jnp.int32), axes) > 0
        return total.x, total.y, total.z, of_any

    x, y, z, of = jax.shard_map(
        fn, mesh=mesh, check_vma=False,
        in_specs=(P(axes, None), P(axes, None), P(axes), P(axes, None)),
        out_specs=(P(), P(), P(), P()),
    )(pts.x, pts.y, pts.inf, scalars)
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


def round_plan(n: int, mesh=None):
    """Static per-round (L, cwin, slot_bound) schedule for an open at key
    length n, split into (big_rounds, tail_rounds): big rounds compile one
    graph each, tail rounds fuse into a single graph.  When a round's MSMs
    shard over `mesh` (_mesh_shardable), the slot bound is sized for the
    PER-SHARD point count."""
    k = n.bit_length() - 1
    n_dev = mesh.devices.size if mesh is not None else 1
    big, tail = [], []
    for i in range(k):
        L = n >> i
        half = L // 2
        n_eff = half // n_dev if _mesh_shardable(mesh, half) else half
        cwin = msm_mod._pick_c(n_eff)
        s = _slot_bound(n_eff, cwin)
        (tail if L <= TAIL_MAX else big).append((L, cwin, s))
    return tuple(big), tuple(tail)


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
    if _mesh_shardable(mesh, half):
        ml, of_l = _msm_static_sharded(curve, mesh, g_lo, a_hi, cwin, s)
        mr, of_r = _msm_static_sharded(curve, mesh, g_hi, a_lo, cwin, s)
    else:
        ml, of_l = _msm_static(curve, g_lo, a_hi, cwin, s)
        mr, of_r = _msm_static(curve, g_hi, a_lo, cwin, s)
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


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _round(curve: CurveSpec, cwin: int, s: int, pm, mesh,
           state, a, b, g: Affine, u: Projective):
    """One folding round, fully on device.  Returns
    (state', l_aff, r_aff, a', b', g'_affine, overflow)."""
    sp = DeviceSponge(curve.fq)
    sp.state, sp.mode, sp.pos = state, pm[0], pm[1]
    l_aff, r_aff, a2, b2, g2, of = _round_body(
        curve, cwin, s, sp, a, b, g, u, mesh=mesh)
    return sp.state, l_aff, r_aff, a2, b2, g2, of


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _tail(curve: CurveSpec, plans, pm, mesh, state, a, b, g: Affine,
          u: Projective):
    """All remaining folding rounds (L <= TAIL_MAX) in ONE graph: the small
    rounds are compile-latency-bound, not work-bound, so fusing them turns
    ~log2(TAIL_MAX) remote compiles into one.  Returns
    (l_stack, r_stack, c=a[0], final_g, overflow_any)."""
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
    overflow = jnp.any(jnp.stack(flags)) if flags else jnp.asarray(False)
    l_stack = scommon.stack_affine(ls) if ls else wst.affine_zero(curve, (0,))
    r_stack = scommon.stack_affine(rs) if rs else wst.affine_zero(curve, (0,))
    final_g = Affine(g.x[0], g.y[0], g.inf[0])
    return l_stack, r_stack, a[0], final_g, overflow


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
    for (_L, cwin, s) in big:
        state, l_aff, r_aff, a, b, g, of = _round(
            curve, cwin, s, ("squeeze", 1), mesh, state, a, b, g, u)
        ls.append(l_aff)
        rs.append(r_aff)
        flags.append(of)

    if tail:
        l_stack, r_stack, c_final, final_g, of_tail = _tail(
            curve, tail, ("squeeze", 1), mesh, state, a, b, g, u)
        flags.append(of_tail)
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
        # pseudo-random folds) — recompute exactly on the host path
        return ipa_pc.open_host(
            curve, ck, coeffs[:n0], comm, point, rand=rand, hiding=False,
            sponge=(sponge.clone() if sponge is not None else None))
    return proof
