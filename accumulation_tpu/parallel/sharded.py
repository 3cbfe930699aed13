"""Multi-chip execution: sharded MSM and folds over a jax device mesh.

The reference has NO distributed layer (rayon only; SURVEY.md §2.3).  Its
TPU-native replacement: the length-n axis (MSM point sets, Hadamard vectors,
polynomial coefficients) is sharded across a 1-D `jax.sharding.Mesh`; each
chip reduces its local points with the dense bucket/bit-serial kernels, and
the per-chip partial group sums are combined with one `all_gather` of 3*n_dev
limb vectors + a local log-depth add tree (group addition is not an
elementwise `psum`, so the collective moves only the n_dev partial points —
bytes on the wire: n_dev * 3 * 64 B, pure ICI).

Scalar-vector folds (weighted sums, Hadamard products) shard trivially: XLA
inserts no collectives because they are elementwise in the sharded axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec, Projective
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def _local_msm(curve: CurveSpec, points: Affine, scalars) -> Projective:
    """Per-shard dense MSM (bit-serial; static shapes, no host sync)."""
    return wst.msm_bitserial(curve, points, scalars)


def msm_sharded(curve: CurveSpec, mesh: Mesh, points: Affine, scalars_mont,
                c: int = None) -> Projective:
    """MSM with the point/scalar axis sharded over the mesh.

    points: (N,) Affine, scalars: (N, NLIMBS); N divisible by mesh size.
    Returns the full (replicated) result.

    Small per-shard sizes use the bit-serial kernel (one dispatch); larger
    ones run per-shard Pippenger: phase 1 extracts per-shard digit ranks and
    `pmax`-reduces the slot bound over the mesh (one scalar host sync, same
    as the single-chip product path), phase 2 runs the static bucket phase
    per shard and combines the n_dev partial sums with one `all_gather` +
    local tree add (bytes on the wire: n_dev * 3 * limbs — pure ICI).
    """
    from ..ops import msm as msm_mod

    n = points.x.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, "point count must divide the mesh"
    n_loc = n // n_dev

    if n_loc <= msm_mod.SMALL_N_THRESHOLD:
        def shard_fn(px, py, pinf, sc):
            local = _local_msm(curve, Affine(px, py, pinf), sc)
            gx = jax.lax.all_gather(local.x, AXIS)
            gy = jax.lax.all_gather(local.y, AXIS)
            gz = jax.lax.all_gather(local.z, AXIS)
            total = wst._tree_reduce(curve, Projective(gx, gy, gz))
            return total.x, total.y, total.z

        mapped = jax.shard_map(
            shard_fn, mesh=mesh, check_vma=False,
            in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS, None)),
            out_specs=(P(), P(), P()),
        )
        x, y, z = mapped(points.x, points.y, points.inf, scalars_mont)
        return Projective(x, y, z)

    if c is None:
        c = msm_mod._pick_c(n_loc)

    # phase 1: per-shard signed digits/ranks + mesh-max slot bound
    def ranks_fn(sc):
        mag, signs, ranks, overflow, mx = msm_mod._signed_digits_and_ranks(
            curve, sc, c)
        return mag, signs, ranks, overflow, jax.lax.pmax(mx, AXIS)

    ranks_mapped = jax.shard_map(
        ranks_fn, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS, None),),
        out_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS), P(AXIS), P()),
    )
    mag, signs, ranks, overflow, wmaxes = ranks_mapped(scalars_mont)
    wm = np.asarray(wmaxes)  # host sync (W small ints, mesh-maxed)
    if int(wm.max()) == 0:
        return wst.projective_zero(curve, ())
    # split planning uses the mesh-wide per-window maxes; each shard's
    # local ranks are <= the mesh max, so the replica-row selection is
    # valid shard-locally (the row axis stays replicated, P(None, AXIS))
    mag, signs, ranks, s, dbl_counts = msm_mod._plan_split(
        mag, signs, ranks, wm, c, n_loc)

    # phase 2: per-shard static bucket phase + ICI combine (each shard's
    # local result already includes its own overflow-window contribution)
    def bucket_fn(px, py, pinf, mg, sg, rk, of):
        perm = jnp.broadcast_to(
            jnp.arange(n_loc, dtype=jnp.int32), mg.shape)
        local = msm_mod._bucket_phase(
            curve, Affine(px, py, pinf), mg, (perm, rk), c, s,
            signs=sg, signed=True, overflow=of, dbl_counts=dbl_counts)
        gx = jax.lax.all_gather(local.x, AXIS)
        gy = jax.lax.all_gather(local.y, AXIS)
        gz = jax.lax.all_gather(local.z, AXIS)
        total = wst._tree_reduce(curve, Projective(gx, gy, gz))
        return total.x, total.y, total.z

    bucket_mapped = jax.shard_map(
        bucket_fn, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS),
                  P(None, AXIS), P(None, AXIS), P(None, AXIS), P(AXIS)),
        out_specs=(P(), P(), P()),
    )
    x, y, z = bucket_mapped(points.x, points.y, points.inf, mag, signs,
                            ranks, overflow)
    return Projective(x, y, z)


def pedersen_commit_sharded(curve: CurveSpec, mesh: Mesh, gens: Affine,
                            vectors, randomness: Optional[jnp.ndarray] = None,
                            hiding_gen: Optional[Affine] = None) -> Projective:
    """Batched Pedersen commits with the vector axis sharded.

    vectors: (B, N, NLIMBS) -> (B,) Projective.
    """
    def shard_fn(px, py, pinf, vecs):
        pts = Affine(px, py, pinf)
        local = jax.vmap(lambda s: _local_msm(curve, pts, s))(vecs)
        gx = jax.lax.all_gather(local.x, AXIS)  # (n_dev, B, L)
        gy = jax.lax.all_gather(local.y, AXIS)
        gz = jax.lax.all_gather(local.z, AXIS)
        total = wst._tree_reduce(curve, Projective(gx, gy, gz))
        return total.x, total.y, total.z

    mapped = jax.shard_map(
        shard_fn, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(None, AXIS, None)),
        out_specs=(P(), P(), P()),
    )
    x, y, z = mapped(gens.x, gens.y, gens.inf, vectors)
    out = Projective(x, y, z)
    if randomness is not None:
        assert hiding_gen is not None
        b = vectors.shape[0]
        hj = wst.from_affine(curve, hiding_gen)
        hb = Projective(
            jnp.broadcast_to(hj.x, (b, NLIMBS)),
            jnp.broadcast_to(hj.y, (b, NLIMBS)),
            jnp.broadcast_to(hj.z, (b, NLIMBS)))
        out = wst.proj_add(curve, out, wst.scalar_mul(curve, hb, randomness))
    return out


def hp_fold_step_sharded(curve: CurveSpec, mesh: Mesh, gens: Affine,
                         a_stack, b_stack, mu, nu):
    """A fused, mesh-sharded hp_as accumulation core: the dp/sp-style
    "training step" for this workload (see __graft_entry__.dryrun_multichip).

    a_stack/b_stack: (m, N, L) sharded on N; mu/nu: (m, L) replicated.
    Computes the t-vec products, their commitments (sharded MSMs reduced over
    ICI) and the folded accumulator witness vectors, all inside one jit.
    """
    fr = curve.fr
    m = a_stack.shape[0]

    def shard_fn(px, py, pinf, a_s, b_s, mu_r, nu_r):
        pts = Affine(px, py, pinf)
        a_scaled = fp.mul(fr, a_s, mu_r[:, None, :])
        b_rev = b_s[::-1]
        prods = fp.mul(fr, a_scaled[:, None], b_rev[None, :])  # (m, m, n_loc, L)
        t_list = []
        for k in range(2 * m - 1):
            terms = [prods[i, k - i]
                     for i in range(max(0, k - m + 1), min(k, m - 1) + 1)]
            acc = terms[0]
            for t in terms[1:]:
                acc = fp.add(fr, acc, t)
            t_list.append(acc)
        t = jnp.stack(t_list)  # (2m-1, n_loc, L)
        local = jax.vmap(lambda s: _local_msm(curve, pts, s))(t)
        gx = jax.lax.all_gather(local.x, AXIS)
        gy = jax.lax.all_gather(local.y, AXIS)
        gz = jax.lax.all_gather(local.z, AXIS)
        t_comms = wst._tree_reduce(curve, Projective(gx, gy, gz))
        # folded witness vectors stay sharded (elementwise in N)
        cc = fp.mul(fr, mu_r, nu_r)
        from ..ops import poly as poly_ops
        a_fold = poly_ops.weighted_sum(fr, a_s, cc)
        b_fold = poly_ops.weighted_sum(fr, b_s[::-1], nu_r)
        return t_comms.x, t_comms.y, t_comms.z, a_fold, b_fold

    mapped = jax.shard_map(
        shard_fn, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS),
                  P(None, AXIS, None), P(None, AXIS, None), P(None, None),
                  P(None, None)),
        out_specs=(P(), P(), P(), P(AXIS, None), P(AXIS, None)),
    )
    cx, cy, cz, a_fold, b_fold = mapped(
        gens.x, gens.y, gens.inf, a_stack, b_stack, mu, nu)
    return Projective(cx, cy, cz), a_fold, b_fold
