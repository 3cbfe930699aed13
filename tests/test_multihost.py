"""Multi-host (DCN x ICI) hierarchical mesh tests on 8 virtual devices.

The ("dcn", "ici") grid is exercised as 2x4: the same shardings a 2-host
pod-slice job would build via `make_mesh_2d` after
`jax.distributed.initialize` (parallel/multihost.py).  Single-process
reshape and multi-process hybrid meshes produce identical PartitionSpecs,
so these tests validate the collective structure without a pod.
"""

import jax
import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.ops import msm as msm_mod
from accumulation_tpu.parallel import context, multihost

C = PALLAS


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return multihost.make_mesh_2d(2, 4)


def _sample(n, tag):
    from accumulation_tpu.pc.pedersen import _sample_points
    return _sample_points(C, n, tag)


def test_make_mesh_2d_shape(mesh2d):
    assert mesh2d.axis_names == ("dcn", "ici")
    assert mesh2d.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        multihost.make_mesh_2d(3)  # 8 devices don't split into 3 granules


def test_msm_2d_bitserial_path(mesh2d, rng):
    """n_loc <= SMALL_N_THRESHOLD: per-chip bit-serial + hierarchical
    combine must match the single-device kernel."""
    n = 256  # n_loc = 32
    pts = _sample(n, b"test-mh-small")
    sc = fp.random_elements(C.fr, rng, (n,))
    want = wst.to_affine(C, wst.msm_bitserial(C, pts, sc))
    got = wst.to_affine(C, multihost.msm_sharded_2d(C, mesh2d, pts, sc))
    assert bool(np.asarray(wst.affine_eq(got, want)))


def test_msm_2d_pippenger_path(mesh2d, rng):
    """n_loc > SMALL_N_THRESHOLD: per-chip bucket phase (signed k+r
    digits, grid-maxed slot bound) + ICI-then-DCN reduce."""
    n = 1024  # n_loc = 128 > 96
    pts = _sample(n, b"test-mh-pip")
    sc = fp.random_elements(C.fr, rng, (n,))
    want = wst.to_affine(C, wst.msm_bitserial(C, pts, sc))
    got = wst.to_affine(C, multihost.msm_sharded_2d(C, mesh2d, pts, sc))
    assert bool(np.asarray(wst.affine_eq(got, want)))


def test_context_dispatch_2d(mesh2d, rng):
    """The active-mesh context routes the product msm() through the
    hierarchical path when the mesh has two axes."""
    n = 256
    pts = _sample(n, b"test-mh-ctx")
    sc = fp.random_elements(C.fr, rng, (n,))
    want = wst.to_affine(C, wst.msm_bitserial(C, pts, sc))
    with context.use_mesh(mesh2d):
        got = wst.to_affine(C, msm_mod.msm(C, pts, sc))
    assert bool(np.asarray(wst.affine_eq(got, want)))



def test_batched_dispatch_2d(mesh2d, rng):
    n = 256
    b = 2
    pts = _sample(n, b"test-mh-batched")
    scb = fp.random_elements(C.fr, rng, (b, n))
    want = [wst.to_affine(C, wst.msm_bitserial(C, pts, scb[i]))
            for i in range(b)]
    with context.use_mesh(mesh2d):
        got = wst.to_affine(C, msm_mod.msm_batched(C, pts, scb))
    for i in range(b):
        gi = wst.Affine(got.x[i], got.y[i], got.inf[i])
        assert bool(np.asarray(wst.affine_eq(gi, want[i])))
