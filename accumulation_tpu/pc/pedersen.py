"""Pedersen vector commitments (layer L3).

TPU-native replacement for `ark_poly_commit::trivial_pc::PedersenCommitment`
(reference call sites: src/hp_as/mod.rs:196-214,377,640-641,911-918 and
src/r1cs_nark_as/r1cs_nark/mod.rs:107-108,216-218).

API surface mirrored: `setup(n)`, `trim(pp, n)`,
`commit(ck, elems, randomness)` (an MSM of length n, + r*H for hiding),
`supported_num_elems`.

Generator derivation is deterministic hash-to-curve, executed ON DEVICE:
candidate x-coordinates come from a seeded counter-mode PRG; a single batched
Tonelli-Shanks solve finds y for every candidate at once, and the first n
valid curve points (in candidate order) are compacted out with a stable sort
— no per-point host loop, which is what makes 2^20-generator setups viable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE
from ..ops import msm as msm_mod

GENERATOR_SEED = b"accumulation-tpu/pedersen/v1"


class PedersenParams(NamedTuple):
    generators: Affine  # (n,)
    hiding_generator: Affine  # ()


class PedersenKey(NamedTuple):
    generators: Affine  # (n,)
    hiding_generator: Affine  # ()

    @property
    def supported_num_elems(self) -> int:
        return self.generators.x.shape[0]


@functools.partial(jax.jit, static_argnums=0)
def _solve_candidates(curve: CurveSpec, xs):
    """xs: (m, NLIMBS) Montgomery candidates -> (Affine (m,), ok (m,))."""
    f = curve.fq
    rhs = fp.add(
        f,
        fp.mul(f, fp.square(f, xs), xs),
        jnp.broadcast_to(jnp.asarray(curve.b_mont, DTYPE), xs.shape),
    )
    y, ok = fp.sqrt(f, rhs)
    # canonical y choice: the smaller of {y, p - y} as integers
    y_neg = fp.neg(f, y)
    yc = fp.from_mont(f, y)
    ync = fp.from_mont(f, y_neg)
    y_is_bigger = fp._geq(yc, ync)
    y = jnp.where(y_is_bigger[..., None], y_neg, y)
    return Affine(xs, y, jnp.zeros(xs.shape[:-1], bool)), ok


def _sample_points(curve: CurveSpec, n: int, seed: bytes) -> Affine:
    """Deterministically sample n independent curve points."""
    if n == 0:
        return wst.affine_zero(curve, (0,))
    import hashlib

    digest = hashlib.blake2b(seed, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "little"))
    found_x, found_y = [], []
    remaining = n
    # candidate x-coordinates: (bitlen(p) - 1)-bit values, always < p
    nl = curve.fq.nlimbs
    cand_bits = curve.fq.modulus.bit_length() - 1
    top_limb = (cand_bits - 1) // 16
    top_mask = (1 << (cand_bits - 16 * top_limb)) - 1
    while remaining > 0:
        # cap the per-call candidate batch: the sqrt exponentiation chain at
        # million-lane batches has crashed the remote TPU worker, and the
        # ok-mask readback crawls through the relay at ~100 MB scale —
        # 2^16-candidate chunks keep both bounded.  Power-of-two batch
        # sizes so the whole loop reuses a handful of compiled shapes.
        m = 1 << max(64, int(remaining * 1.3)).bit_length()
        m = min(m, 1 << 16)
        raw = rng.integers(0, 1 << 16, size=(m, nl), dtype=np.uint32)
        raw[:, top_limb] &= top_mask
        raw[:, top_limb + 1:] = 0
        pts, ok = _solve_candidates(curve, fp.to_mont(curve.fq, jnp.asarray(raw)))
        # device-side compaction: the only host sync per chunk is the
        # success count (full-coordinate readbacks crawl through the relay)
        kk = int(jnp.sum(ok))
        if kk == 0:
            continue
        idx = jnp.nonzero(ok, size=kk)[0]
        take = min(remaining, kk)
        found_x.append(pts.x[idx[:take]])
        found_y.append(pts.y[idx[:take]])
        remaining -= take
    gx = jnp.concatenate(found_x, axis=0)
    gy = jnp.concatenate(found_y, axis=0)
    pts = Affine(gx, gy, jnp.zeros((n,), bool))
    if curve.cofactor != 1:
        # Clear the cofactor so every sampled point lies in the prime-order
        # subgroup — otherwise Pedersen loses its homomorphism (scalar
        # arithmetic is mod fr, which only matches the group law on the
        # fr-torsion; BLS12-381 G1 has cofactor ~2^126).
        cleared = wst.scalar_mul_int(
            curve, wst.from_affine(curve, pts), curve.cofactor)
        pts = wst.to_affine(curve, cleared)
        assert not bool(np.asarray(jnp.any(pts.inf))), (
            "cofactor clearing produced the identity (re-seed the sampler)")
    return pts


def setup(curve: CurveSpec, n: int) -> PedersenParams:
    """`PedersenCommitment::setup(n)` analog (deterministic)."""
    pts = _sample_points(curve, n + 1, GENERATOR_SEED + b"|" + curve.name.encode())
    gens = Affine(pts.x[:n], pts.y[:n], pts.inf[:n])
    h = Affine(pts.x[n], pts.y[n], pts.inf[n])
    return PedersenParams(gens, h)


def trim(pp: PedersenParams, n: int) -> PedersenKey:
    assert pp.generators.x.shape[0] >= n, "setup too small for trim"
    g = pp.generators
    return PedersenKey(Affine(g.x[:n], g.y[:n], g.inf[:n]), pp.hiding_generator)


def commit(curve: CurveSpec, ck: PedersenKey, elems, randomness=None) -> Affine:
    """Commit to a vector of scalars: C = <elems, G> (+ r*H).

    elems: (k, NLIMBS) Montgomery Fr with k <= supported; randomness: scalar
    (NLIMBS,) or None.  Returns a single affine point.
    """
    k = elems.shape[0]
    n = ck.supported_num_elems
    assert k <= n, "vector longer than key"
    gens = Affine(ck.generators.x[:k], ck.generators.y[:k], ck.generators.inf[:k])
    acc = msm_mod.msm(curve, gens, elems)
    if randomness is not None:
        h_j = wst.from_affine(curve, ck.hiding_generator)
        acc = wst.proj_add(curve, acc, wst.scalar_mul(curve, h_j, randomness))
    return wst.to_affine(curve, acc)


def commit_batched(curve: CurveSpec, ck: PedersenKey, elems, randomness=None) -> Affine:
    """Batched commit: elems (B, k, NLIMBS), randomness (B, NLIMBS) or None.

    One fused batched MSM (the TPU-native grouping of e.g. the 2m-2 t-vec
    commits, reference src/hp_as/mod.rs:354-388)."""
    b, k = elems.shape[0], elems.shape[1]
    gens = Affine(ck.generators.x[:k], ck.generators.y[:k], ck.generators.inf[:k])
    acc = msm_mod.msm_batched(curve, gens, elems)
    if randomness is not None:
        h_j = wst.from_affine(curve, ck.hiding_generator)
        hb = wst.Projective(
            jnp.broadcast_to(h_j.x, (b, NLIMBS)),
            jnp.broadcast_to(h_j.y, (b, NLIMBS)),
            jnp.broadcast_to(h_j.z, (b, NLIMBS)),
        )
        acc = wst.proj_add(curve, acc, wst.scalar_mul(curve, hb, randomness))
    return wst.to_affine(curve, acc)
