"""Pippenger MSM vs the bit-serial reference kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.ops import msm as msm_mod

C = PALLAS
N = 300


@pytest.fixture(scope="module")
def points():
    # hash-to-curve sampling (same path as Pedersen setup); avoids compiling
    # a batched scalar_mul graph here — XLA:CPU has segfaulted compiling it
    # late in a long test session
    from accumulation_tpu.pc.pedersen import _sample_points
    return _sample_points(C, N, b"test-msm-points")


@pytest.mark.parametrize("c", [4, 8])
def test_pippenger_matches_bitserial(points, rng, c):
    sc = fp.random_elements(C.fr, rng, (N,))
    sc = sc.at[5].set(0)
    expect = wst.to_affine(C, wst.msm_bitserial(C, points, sc))
    got = wst.to_affine(C, msm_mod.msm(C, points, sc, c=c))
    assert bool(np.asarray(wst.affine_eq(got, expect)))


def test_batched(points, rng):
    b = 3
    scb = fp.random_elements(C.fr, rng, (b, N))
    got = wst.to_affine(C, msm_mod.msm_batched(C, points, scb))
    for i in range(b):
        want = wst.to_affine(C, msm_mod.msm(C, points, scb[i]))
        assert bool(np.asarray(wst.affine_eq(
            wst.Affine(got.x[i], got.y[i], got.inf[i]), want)))


def test_all_zero_scalars(points):
    sc = jnp.zeros((N, 16), jnp.uint32)
    got = msm_mod.msm(C, points, sc, c=4)
    assert bool(np.asarray(fp.is_zero(got.z)))
