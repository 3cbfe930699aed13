"""Multi-host execution: DCN x ICI hierarchical meshes.

The reference is single-process (rayon threads only; SURVEY.md §2.3).  Its
large-scale TPU replacement spans pods: hosts are connected by DCN
(data-center network, ~10-100x lower bandwidth and higher latency than ICI),
chips within a host/slice by ICI.  The layout rule from the scaling
playbook: put the heavily-communicating axis on ICI, keep DCN traffic to
scalar-sized reductions.

For MSM — the throughput core — that is easy to make exact:

  * the length-n point/scalar axis is sharded over the FLATTENED
    (dcn, ici) product: every chip owns n / (D*I) points;
  * each chip runs the dense bucket phase locally (zero communication);
  * partial group sums are combined hierarchically: one `all_gather` over
    "ici" + local tree-add (per-host result, pure ICI), then one
    `all_gather` over "dcn" + tree-add.  DCN moves exactly D partial
    points (D * 3 * 64 B per MSM) — latency-bound, never bandwidth-bound;
  * the slot-bound host sync pmax-reduces over BOTH axes so every chip
    compiles the same static bucket shape.

Scalar/vector folds (Hadamard products, weighted sums) are elementwise in
the sharded axis — XLA inserts no collectives at all, on either network.

Process bootstrap: each host calls `initialize()` (a thin gate over
`jax.distributed.initialize`) before first backend use, then builds the
hybrid mesh with `make_mesh_2d()`.  Single-process multi-device runs (the
test suite's 8 virtual CPU devices, or one host of a pod slice) get the
same mesh semantics via a plain reshape, so the sharding layer is testable
without a pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec, Projective
from ..fields import fp

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job (no-op when single-process).

    Call once per host before any backend use.  On TPU pods with standard
    orchestration (GKE/queued resources) all three arguments are inferred
    from the environment, so `initialize()` with no args is the common
    path; explicit args support bare-VM bring-up.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_mesh_2d(n_dcn: int, n_ici: Optional[int] = None,
                 devices=None) -> Mesh:
    """Build a ("dcn", "ici") mesh of shape (n_dcn, n_ici).

    Multi-process jobs (jax.process_count() > 1) use the hybrid mesh
    builder so the "dcn" axis maps exactly onto process (host) granules
    and "ici" stays within each host's chips.  Single-process runs reshape
    the device list — semantically identical shardings, which is what the
    virtual-device test suite and the driver dryrun validate.
    """
    if devices is None:
        devices = jax.devices()
    if n_ici is None:
        if len(devices) % n_dcn:
            raise ValueError(f"{len(devices)} devices do not split into "
                             f"{n_dcn} DCN granules")
        n_ici = len(devices) // n_dcn
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils
        try:
            # TPU pods: granule = slice (devices carry slice_index)
            arr = mesh_utils.create_hybrid_device_mesh(
                (1, n_ici), (n_dcn, 1), devices=devices)
        except ValueError:
            # CPU/GPU multi-process jobs have no slice_index granules —
            # the host boundary IS the process boundary (found by
            # scripts/dcn_smoke.py, r05: "Number of slices 1 must equal
            # the product of dcn_mesh_shape")
            arr = mesh_utils.create_hybrid_device_mesh(
                (1, n_ici), (n_dcn, 1), devices=devices,
                process_is_granule=True)
    else:
        if len(devices) < n_dcn * n_ici:
            raise ValueError(f"mesh ({n_dcn}, {n_ici}) needs "
                             f"{n_dcn * n_ici} devices, have {len(devices)}")
        arr = np.asarray(devices[:n_dcn * n_ici]).reshape(n_dcn, n_ici)
    return Mesh(arr, (DCN_AXIS, ICI_AXIS))


def _hier_reduce(curve: CurveSpec, local: Projective) -> Projective:
    """ICI-first hierarchical combine of per-chip partial sums.

    all_gather over "ici" + tree add (per-host total), then all_gather of
    the host totals over "dcn" + tree add.  The second collective is the
    ONLY DCN traffic in the whole MSM.
    """
    gx = jax.lax.all_gather(local.x, ICI_AXIS)
    gy = jax.lax.all_gather(local.y, ICI_AXIS)
    gz = jax.lax.all_gather(local.z, ICI_AXIS)
    host = wst._tree_reduce(curve, Projective(gx, gy, gz))
    hx = jax.lax.all_gather(host.x, DCN_AXIS)
    hy = jax.lax.all_gather(host.y, DCN_AXIS)
    hz = jax.lax.all_gather(host.z, DCN_AXIS)
    return wst._tree_reduce(curve, Projective(hx, hy, hz))


def msm_sharded_2d(curve: CurveSpec, mesh: Mesh, points: Affine,
                   scalars_mont, c: int = None) -> Projective:
    """MSM with the point axis sharded over the full (dcn, ici) grid.

    points: (N,) Affine, scalars: (N, NLIMBS); N divisible by the grid
    size.  Returns the full (replicated) result.  Same two-phase product
    path as `sharded.msm_sharded` (signed k+r digits, host-synced slot
    bound, split sweep) with the hierarchical combine above.
    """
    from ..ops import msm as msm_mod

    n = points.x.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, "point count must divide the mesh"
    n_loc = n // n_dev
    both = (DCN_AXIS, ICI_AXIS)
    pt_spec = P(both, None)

    if n_loc <= msm_mod.SMALL_N_THRESHOLD:
        def shard_fn(px, py, pinf, sc):
            local = wst.msm_bitserial(curve, Affine(px, py, pinf), sc)
            total = _hier_reduce(curve, local)
            return total.x, total.y, total.z

        mapped = jax.shard_map(
            shard_fn, mesh=mesh, check_vma=False,
            in_specs=(pt_spec, pt_spec, P(both), pt_spec),
            out_specs=(P(), P(), P()),
        )
        x, y, z = mapped(points.x, points.y, points.inf, scalars_mont)
        return Projective(x, y, z)

    if c is None:
        c = msm_mod._pick_c(n_loc)

    # phase 1: per-chip signed digits/ranks; slot bound maxed over the grid
    def ranks_fn(sc):
        mag, signs, ranks, overflow, mx = msm_mod._signed_digits_and_ranks(
            curve, sc, c)
        return mag, signs, ranks, overflow, jax.lax.pmax(mx, both)

    ranks_mapped = jax.shard_map(
        ranks_fn, mesh=mesh, check_vma=False,
        in_specs=(pt_spec,),
        out_specs=(P(None, both), P(None, both), P(None, both), P(both),
                   P()),
    )
    mag, signs, ranks, overflow, wmaxes = ranks_mapped(scalars_mont)
    wm = np.asarray(wmaxes)  # host sync: W small ints, grid-maxed
    if int(wm.max()) == 0:
        return wst.projective_zero(curve, ())
    mag, signs, ranks, s, dbl_counts = msm_mod._plan_split(
        mag, signs, ranks, wm, c, n_loc)

    # phase 2: per-chip static bucket phase + hierarchical combine
    def bucket_fn(px, py, pinf, mg, sg, rk, of):
        perm = jnp.broadcast_to(
            jnp.arange(n_loc, dtype=jnp.int32), mg.shape)
        local = msm_mod._bucket_phase(
            curve, Affine(px, py, pinf), mg, (perm, rk), c, s,
            signs=sg, signed=True, overflow=of, dbl_counts=dbl_counts)
        total = _hier_reduce(curve, local)
        return total.x, total.y, total.z

    bucket_mapped = jax.shard_map(
        bucket_fn, mesh=mesh, check_vma=False,
        in_specs=(pt_spec, pt_spec, P(both),
                  P(None, both), P(None, both), P(None, both), P(both)),
        out_specs=(P(), P(), P()),
    )
    x, y, z = bucket_mapped(points.x, points.y, points.inf, mag, signs,
                            ranks, overflow)
    return Projective(x, y, z)
