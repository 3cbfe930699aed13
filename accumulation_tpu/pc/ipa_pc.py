"""Inner-product-argument polynomial commitment (layer L3 — the dominant
component, SURVEY.md §2.2).

TPU-native counterpart of `ark_poly_commit::ipa_pc::InnerProductArgPC` as
consumed by the reference (setup/trim/commit/open/check/succinct_check,
`SuccinctCheckPolynomial`; reference call sites src/ipa_pc_as/mod.rs:33-39,
147-162,198-205,400,418,454-462,507-537,836-845).

Key structure: `ck = {comm_key: G_0..G_d, h, s}` where `h` is the base of the
evaluation-binding generator U = xi_0 * h and `s` is the hiding generator
(C = <a, G> + omega * s).  An opening proof carries the log-n round cross
commitments (l_vec, r_vec), the folded scalar `c`, the folded key point
`final_comm_key`, and optional (hiding_comm, rand).

Transcript spec (domain "IPA-PC-2020", documented here; the Rust branch's
internals are not reproducible in this environment):
  1. absorb (commitment, point, value);
  2. [hiding] absorb hiding_comm; alpha = squeeze(128); comm' += alpha*hiding_comm;
  3. [randomness] absorb rand (32-byte scalar); C_bare = comm' - rand*s;
  4. xi_0 = squeeze(128);  U = xi_0 * h;  C_0 = C_bare + value*U;
  5. per round i = 1..k: absorb (l_i, r_i); xi_i = squeeze(128);
     C_i = C_{i-1} + xi_i*l_i + xi_i^{-1}*r_i;
     folds: a' = a_lo + xi_i a_hi; b' = b_lo + xi_i^{-1} b_hi;
            G' = G_lo + xi_i^{-1} G_hi.
  6. accept iff C_k == c*final_comm_key + c*h(z)*U, where the succinct check
     polynomial is h(X) = prod_{j=0}^{k-1} (1 + xi_{k-j} X^{2^j}).

The hiding polynomial is sampled as (X - z) * q(X) with q random of degree
d-1, so the claimed evaluation is unchanged by the alpha-combination.

TPU shape: the fold of the key vector (the prover's dominant cost) is one
batched 128-bit double-and-add over n/2 lanes per round; l/r cross terms are
Pippenger MSMs; succinct_check materialises h(X) with a log-depth tensor
product.
"""

from __future__ import annotations

import functools
import os as _os
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

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
from . import pedersen
from .pedersen import _sample_points

CHALLENGE_SIZE = 128
GENERATOR_SEED = b"accumulation-tpu/ipa-pc/v1"


class CommitterKey(NamedTuple):
    comm_key: Affine  # (n,) with n = supported_degree + 1
    h: Affine  # U base
    s: Affine  # hiding generator
    # max hiding bound committed polynomials may carry (reference passes the
    # predicate's supported_hiding_bound into IpaPC::trim,
    # /root/reference/src/ipa_pc_as/mod.rs:507-513); -1 = no hiding support
    supported_hiding_bound: int = -1

    @property
    def supported_degree(self) -> int:
        return self.comm_key.x.shape[0] - 1


VerifierKey = CommitterKey


class SuccinctVerifierKey(NamedTuple):
    h: Affine
    s: Affine
    supported_degree: int


@dataclass
class Proof:
    """ipa_pc::Proof analog (l/r cross terms + folded values)."""

    l_vec: Affine  # (k,)
    r_vec: Affine  # (k,)
    final_comm_key: Affine  # ()
    c: jnp.ndarray  # (NLIMBS,) folded scalar
    hiding_comm: Optional[Affine] = None
    rand: Optional[jnp.ndarray] = None


@dataclass
class SuccinctCheckPolynomial:
    """h(X) = prod_{j=0}^{k-1}(1 + xi_{k-j} X^{2^j}); stores the xi vector."""

    challenges: jnp.ndarray  # (k, NLIMBS) Montgomery Fr

    def compute_coeffs(self, fr):
        """Materialise the 2^k coefficients (log-depth tensor product)."""
        k = self.challenges.shape[0]
        coeffs = jnp.asarray(fr.one_mont, DTYPE)[None, :]  # [1]
        for j in range(k):
            xi = self.challenges[k - 1 - j]
            coeffs = jnp.concatenate(
                [coeffs, fp.mul(fr, coeffs, xi[None, :])], axis=0)
        return coeffs

    def evaluate(self, fr, point):
        """h(z) = prod (1 + xi_{k-j} z^{2^j}) — k muls."""
        k = self.challenges.shape[0]
        one = jnp.asarray(fr.one_mont, DTYPE)
        acc = one
        zpow = point
        for j in range(k):
            term = fp.add(fr, one, fp.mul(fr, self.challenges[k - 1 - j], zpow))
            acc = fp.mul(fr, acc, term)
            zpow = fp.square(fr, zpow)
        return acc


class UniversalParams(NamedTuple):
    points: Affine  # (max_n + 2,)

    @property
    def max_degree(self) -> int:
        return self.points.x.shape[0] - 3


def _round_pow2(n: int) -> int:
    return 1 << max((n - 1).bit_length(), 0)


def setup(curve: CurveSpec, max_degree: int) -> UniversalParams:
    """Degrees are rounded up to 2^k - 1 (as ark's ipa_pc does)."""
    n = _round_pow2(max_degree + 1)
    pts = _sample_points(
        curve, n + 2, GENERATOR_SEED + b"|" + curve.name.encode())
    return UniversalParams(pts)


def trim(pp: UniversalParams, supported_degree: int,
         supported_hiding_bound: Optional[int] = None) -> CommitterKey:
    p = pp.points
    n = _round_pow2(supported_degree + 1)
    assert p.x.shape[0] >= n + 2
    if supported_hiding_bound is None:
        supported_hiding_bound = supported_degree
    return CommitterKey(
        Affine(p.x[:n], p.y[:n], p.inf[:n]),
        Affine(p.x[-2], p.y[-2], p.inf[-2]),
        Affine(p.x[-1], p.y[-1], p.inf[-1]),
        supported_hiding_bound,
    )


def svk_of(ck: CommitterKey) -> SuccinctVerifierKey:
    return SuccinctVerifierKey(ck.h, ck.s, ck.supported_degree)


def commit(curve: CurveSpec, ck: CommitterKey, coeffs, randomness=None) -> Affine:
    """C = <coeffs, G> (+ randomness * s)."""
    k = coeffs.shape[0]
    gens = Affine(ck.comm_key.x[:k], ck.comm_key.y[:k], ck.comm_key.inf[:k])
    acc = msm_mod.msm(curve, gens, coeffs)
    if randomness is not None:
        acc = wst.proj_add(
            curve, acc,
            wst.scalar_mul(curve, wst.from_affine(curve, ck.s), randomness))
    return wst.to_affine(curve, acc)


# ---------------------------------------------------------------------------
# folding helpers (jitted per size)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def _fold_scalars(curve: CurveSpec, lo, hi, xi):
    return fp.add(curve.fr, lo, fp.mul(curve.fr, hi, xi[None, :]))


@functools.partial(jax.jit, static_argnums=(0, 3))
def _fold_points(curve: CurveSpec, lo: Projective, hi: Projective, nbits: int,
                 xi_bits):
    """lo + xi*hi with a batched nbits-step double-and-add over the hi lanes.

    xi_bits: (nbits,) uint32 LE bits of the (truncated) challenge.
    """
    def body(acc, i):
        acc = wst._dbl_raw(curve, acc)
        bit = xi_bits[nbits - 1 - i]
        added = wst._add_raw(curve, acc, hi)
        take = jnp.full(hi.z.shape[:-1], bit == 1)
        acc = wst._where_pt(take, added, acc)
        return acc, None

    init = wst.projective_zero(curve, hi.z.shape[:-1])
    mult, _ = jax.lax.scan(body, init, jnp.arange(nbits))
    return wst._add_raw(curve, lo, mult)


@functools.partial(jax.jit, static_argnums=0)
def _inner_product(curve: CurveSpec, a, b):
    fr = curve.fr
    prods = fp.mul(fr, a, b)
    n = prods.shape[0]
    while n > 1:
        half = n // 2
        lo, hi = prods[:half], prods[half:half * 2]
        s = fp.add(fr, lo, hi)
        if n % 2:
            s = jnp.concatenate([s, prods[-1:]], axis=0)
            n = half + 1
        else:
            n = half
        prods = s
    return prods[0]


def _msm_proj(curve, points: Projective, scalars) -> Projective:
    """MSM over projective points (normalises first for the affine kernel)."""
    aff = wst.to_affine(curve, points)
    return msm_mod.msm(curve, aff, scalars)


# ---------------------------------------------------------------------------
# open / check
# ---------------------------------------------------------------------------


def _round0(curve, sponge: PoseidonSponge, comm: Affine, point, value,
            hiding_comm: Optional[Affine], rand_provider, svk_s: Affine):
    """Shared transcript prologue (spec steps 1-4).

    rand_provider(alpha_int or None) -> total revealed randomness (array) or
    None; called after the alpha squeeze so the prover can fold its hiding
    randomness in.  Returns (C_bare projective, xi_0_int, alpha_int, rand).
    """
    from ..schemes import common as scommon

    fr = curve.fr
    scommon.absorb_affine(sponge, curve, comm)
    sponge.absorb_scalar(fp.to_int(fr, point))
    sponge.absorb_scalar(fp.to_int(fr, value))
    comm_p = wst.from_affine(curve, comm)
    alpha = None
    if hiding_comm is not None:
        scommon.absorb_affine(sponge, curve, hiding_comm)
        alpha = sponge.squeeze_nonnative_truncated(CHALLENGE_SIZE)[0]
        comm_p = wst.proj_add(
            curve, comm_p,
            wst.scalar_mul(curve, wst.from_affine(curve, hiding_comm),
                           fp.from_int(fr, alpha)))
    rand = rand_provider(alpha)
    if rand is not None:
        sponge.absorb_scalar(fp.to_int(fr, rand))
        s_neg = wst.jac_neg(curve, wst.from_affine(curve, svk_s))
        comm_p = wst.proj_add(
            curve, comm_p, wst.scalar_mul(curve, s_neg, rand))
    xi0 = sponge.squeeze_nonnative_truncated(CHALLENGE_SIZE)[0]
    return comm_p, xi0, alpha, rand


def open(curve: CurveSpec, ck: CommitterKey, coeffs, comm: Affine, point,
         rand=None, hiding: bool = False, rng=None,
         sponge: Optional[PoseidonSponge] = None) -> Proof:
    """IPA opening proof for p(point) (= `open_individual_opening_challenges`).

    coeffs: (deg+1, L); comm: the commitment the verifier holds (including
    any rand*s term); rand: the total commitment randomness (revealed).

    Non-hiding opens route to the fused on-device prover
    (jit/ipa_open_fused.py): identical transcript on the device sponge,
    zero host round-trips in the log-n folding loop (the reference's
    ⟵⟵HOT path, /root/reference/src/ipa_pc_as/mod.rs:424-472).  Set
    ACCUM_TPU_FUSED_OPEN=0 to force the host-sponge path.
    """
    if not hiding and _os.environ.get("ACCUM_TPU_FUSED_OPEN", "1") == "1":
        from ..jit import ipa_open_fused
        return ipa_open_fused.open_fused(
            curve, ck, coeffs, comm, point, rand=rand, sponge=sponge)
    return open_host(curve, ck, coeffs, comm, point, rand=rand,
                     hiding=hiding, rng=rng, sponge=sponge)


def open_host(curve: CurveSpec, ck: CommitterKey, coeffs, comm: Affine, point,
              rand=None, hiding: bool = False, rng=None,
              sponge: Optional[PoseidonSponge] = None) -> Proof:
    """Host-sponge opening prover (hiding path + fused cross-check oracle)."""
    fr = curve.fr
    sponge = sponge or domain_sponge(curve.fq, IPA_PC_DOMAIN)
    value = poly_ops.evaluate(fr, coeffs, point)

    # pad the polynomial to the (power-of-two) key length
    n = ck.comm_key.x.shape[0]
    n0 = coeffs.shape[0]
    assert n0 <= n, "polynomial degree exceeds committer key"
    if n0 < n:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((n - n0, NLIMBS), DTYPE)], axis=0)
    k = n.bit_length() - 1

    hiding_comm = None
    ph = omega_h = None
    if hiding:
        assert rng is not None
        if ck.supported_hiding_bound < 0:
            raise ValueError(
                "hiding open requested but the committer key was trimmed "
                "without hiding support (supported_hiding_bound < 0)")
        # p_h = (X - z) q, so p_h(z) = 0 and the claimed value is unchanged.
        q = fp.random_elements(fr, rng, (n - 1,)) if n > 1 else None
        if q is not None:
            ph = jnp.concatenate([common_zero_row(), q], axis=0)
            ph = ph.at[:-1].set(
                fp.sub(fr, ph[:-1], fp.mul(fr, q, point[None, :])))
        else:
            ph = jnp.zeros((1, NLIMBS), DTYPE)
        omega_h = fp.random_elements(fr, rng, ())
        hiding_comm = commit(curve, ck, ph, omega_h)

    def rand_provider(alpha_int):
        if hiding:
            base = rand if rand is not None else jnp.zeros((NLIMBS,), DTYPE)
            alpha = fp.from_int(fr, alpha_int)
            return fp.add(fr, base, fp.mul(fr, alpha, omega_h))
        return rand

    comm_p, xi0_int, alpha_int, total_rand = _round0(
        curve, sponge, comm, point, value, hiding_comm, rand_provider, ck.s)

    if hiding:
        alpha = fp.from_int(fr, alpha_int)
        coeffs = fp.add(fr, coeffs, fp.mul(fr, ph, alpha[None, :]))

    g_proj = wst.from_affine(curve, ck.comm_key)

    a = coeffs
    b = poly_ops.powers(fr, point, n)
    u_base = wst.from_affine(curve, ck.h)
    u = wst.scalar_mul(curve, u_base, fp.from_int(fr, xi0_int))

    ls, rs = [], []
    from ..schemes import common as scommon
    for _ in range(k):
        half = a.shape[0] // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        g_lo = Projective(*(t[:half] for t in g_proj))
        g_hi = Projective(*(t[half:] for t in g_proj))

        # C' = C + xi*l + xi^{-1}*r with a' = a_lo + xi a_hi and
        # b'/G' folded by xi^{-1}:
        l_pt = wst.proj_add(
            curve, _msm_proj(curve, g_lo, a_hi),
            wst.scalar_mul(curve, u, _inner_product(curve, a_hi, b_lo)))
        r_pt = wst.proj_add(
            curve, _msm_proj(curve, g_hi, a_lo),
            wst.scalar_mul(curve, u, _inner_product(curve, a_lo, b_hi)))
        lr = wst.to_affine(curve, Projective(
            jnp.stack([l_pt.x, r_pt.x]), jnp.stack([l_pt.y, r_pt.y]),
            jnp.stack([l_pt.z, r_pt.z])))
        l_aff = Affine(lr.x[0], lr.y[0], lr.inf[0])
        r_aff = Affine(lr.x[1], lr.y[1], lr.inf[1])
        ls.append(l_aff)
        rs.append(r_aff)
        scommon.absorb_affine(sponge, curve, l_aff)
        scommon.absorb_affine(sponge, curve, r_aff)
        xi_int = sponge.squeeze_nonnative_truncated(CHALLENGE_SIZE)[0]
        xi = fp.from_int(fr, xi_int)
        xi_inv = fp.inv(fr, xi)
        a = _fold_scalars(curve, a_lo, a_hi, xi)
        b = _fold_scalars(curve, b_lo, b_hi, xi_inv)
        xi_inv_bits = fp.canonical_bits(fr, xi_inv, 256)
        g_proj = _fold_points(curve, g_lo, g_hi, 256, xi_inv_bits)

    final_g = wst.to_affine(curve, Projective(g_proj.x[0], g_proj.y[0], g_proj.z[0]))
    return Proof(
        l_vec=scommon.stack_affine(ls) if ls else wst.affine_zero(curve, (0,)),
        r_vec=scommon.stack_affine(rs) if rs else wst.affine_zero(curve, (0,)),
        final_comm_key=final_g,
        c=a[0],
        hiding_comm=hiding_comm,
        rand=total_rand,
    )


def common_zero_row():
    return jnp.zeros((1, NLIMBS), DTYPE)


def succinct_check(curve: CurveSpec, svk: SuccinctVerifierKey, comm: Affine,
                   point, value, proof: Proof,
                   sponge: Optional[PoseidonSponge] = None
                   ) -> Optional[Tuple[SuccinctCheckPolynomial, Affine]]:
    """Transcript-only check; returns (check_polynomial, final_comm_key) or
    None on failure (reference ipa_pc_as/mod.rs:198-205 usage)."""
    fr = curve.fr
    sponge = sponge or domain_sponge(curve.fq, IPA_PC_DOMAIN)
    from ..schemes import common as scommon

    # Fixed-round structure: the round count is determined by the committer
    # key length (a power of two), not by the proof — a shorter l_vec would
    # otherwise be silently accepted as a lower-degree claim, weakening
    # degree-bound enforcement.
    k_expected = (svk.supported_degree + 1).bit_length() - 1
    if (proof.l_vec.x.shape[0] != k_expected
            or proof.r_vec.x.shape[0] != k_expected):
        return None

    comm_p, xi0_int, _, _ = _round0(
        curve, sponge, comm, point, value, proof.hiding_comm,
        lambda _alpha: proof.rand, svk.s)

    u_base = wst.from_affine(curve, svk.h)
    u = wst.scalar_mul(curve, u_base, fp.from_int(fr, xi0_int))
    c_acc = wst.proj_add(curve, comm_p, wst.scalar_mul(curve, u, value))

    k = proof.l_vec.x.shape[0]
    xi_invs = []
    for i in range(k):
        l_aff = Affine(proof.l_vec.x[i], proof.l_vec.y[i], proof.l_vec.inf[i])
        r_aff = Affine(proof.r_vec.x[i], proof.r_vec.y[i], proof.r_vec.inf[i])
        scommon.absorb_affine(sponge, curve, l_aff)
        scommon.absorb_affine(sponge, curve, r_aff)
        xi_int = sponge.squeeze_nonnative_truncated(CHALLENGE_SIZE)[0]
        xi = fp.from_int(fr, xi_int)
        xi_inv = fp.inv(fr, xi)
        xi_invs.append(xi_inv)
        c_acc = wst.proj_add(
            curve, c_acc,
            wst.proj_add(
                curve,
                wst.scalar_mul(curve, wst.from_affine(curve, l_aff), xi),
                wst.scalar_mul(curve, wst.from_affine(curve, r_aff), xi_inv)))

    # b and G fold by xi^{-1}, so h(X)'s challenges are the inverses.
    check_poly = SuccinctCheckPolynomial(
        jnp.stack(xi_invs) if xi_invs else jnp.zeros((0, NLIMBS), DTYPE))
    b_final = check_poly.evaluate(fr, point)
    c_final = proof.c
    expect = wst.proj_add(
        curve,
        wst.scalar_mul(curve, wst.from_affine(curve, proof.final_comm_key),
                       c_final),
        wst.scalar_mul(curve, u, fp.mul(fr, c_final, b_final)))
    ok = bool(np.asarray(wst.proj_eq(curve, c_acc, expect)))
    if not ok:
        return None
    return check_poly, proof.final_comm_key


def check(curve: CurveSpec, vk: VerifierKey, comm: Affine, point, value,
          proof: Proof, sponge: Optional[PoseidonSponge] = None) -> bool:
    """Full check: succinct check + final_comm_key == <h_coeffs, G> (an MSM).

    (= `check_individual_opening_challenges`, the AS decider's cost.)"""
    res = succinct_check(curve, svk_of(vk), comm, point, value, proof, sponge)
    if res is None:
        return False
    check_poly, final_key = res
    coeffs = check_poly.compute_coeffs(curve.fr)
    n = coeffs.shape[0]
    gens = Affine(vk.comm_key.x[:n], vk.comm_key.y[:n], vk.comm_key.inf[:n])
    expected = wst.to_affine(curve, msm_mod.msm(curve, gens, coeffs))
    return bool(np.asarray(wst.affine_eq(expected, final_key)))
