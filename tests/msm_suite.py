"""Pippenger MSM consistency tests.

Ground truth comes from the bit-serial kernel at small N (its large-N graph
deterministically segfaults the XLA:CPU compiler late in long sessions, so
the 300-point checks compare independent Pippenger configurations instead —
bit-serial itself is validated against a python model in test_curves)."""

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
    from accumulation_tpu.pc.pedersen import _sample_points
    return _sample_points(C, N, b"test-msm-points")


def test_pippenger_small_vs_bitserial(points, rng):
    n = 64
    pts = wst.Affine(points.x[:n], points.y[:n], points.inf[:n])
    sc = fp.random_elements(C.fr, rng, (n,))
    expect = wst.to_affine(C, wst.msm_bitserial(C, pts, sc))
    sorted_digits, perm, ranks, mc = msm_mod._digits_and_sort(C, sc, 4)
    s = 1 << (int(mc) - 1).bit_length()
    got = wst.to_affine(C, msm_mod._bucket_phase(
        C, pts, sorted_digits, (perm, ranks), 4, s))
    assert bool(np.asarray(wst.affine_eq(got, expect)))


def test_pippenger_window_consistency(points, rng):
    """Independent window configurations must agree at N=300."""
    sc = fp.random_elements(C.fr, rng, (N,))
    sc = sc.at[5].set(0)
    r4 = wst.to_affine(C, msm_mod.msm(C, points, sc, c=4))
    r8 = wst.to_affine(C, msm_mod.msm(C, points, sc, c=8))
    assert bool(np.asarray(wst.affine_eq(r4, r8)))


def test_batched(points, rng):
    b = 3
    scb = fp.random_elements(C.fr, rng, (b, N))
    got = wst.to_affine(C, msm_mod.msm_batched(C, points, scb))
    for i in range(b):
        want = wst.to_affine(C, msm_mod.msm(C, points, scb[i]))
        assert bool(np.asarray(wst.affine_eq(
            wst.Affine(got.x[i], got.y[i], got.inf[i]), want)))


def test_split_sweep_matches_plain(rng):
    """Top-window split layout (virtual replica rows, _split_hot_window)
    must agree with the plain shared-bound layout at a size where the
    split actually triggers (n >= SPLIT_MIN_N and the k+r top window is
    structurally hot — see _plan_split)."""
    n = 2048
    from accumulation_tpu.pc.pedersen import _sample_points
    pts = _sample_points(C, n, b"test-msm-split")
    sc = fp.random_elements(C.fr, rng, (n,))
    c = 8
    mag, signs, ranks, overflow, wmaxes = msm_mod._signed_digits_and_ranks(
        C, sc, c)
    wm = np.asarray(wmaxes)
    m2, s2, r2, s_split, dc = msm_mod._plan_split(mag, signs, ranks, wm, c, n)
    assert dc is not None, "split did not trigger at n=2048/c=8"
    perm_s = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), m2.shape)
    got = wst.to_affine(C, msm_mod._bucket_phase(
        C, pts, m2, (perm_s, r2), c, s_split,
        signs=s2, signed=True, overflow=overflow, dbl_counts=dc))
    s_plain = msm_mod._quantize_slots(int(wm.max()), n)
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mag.shape)
    want = wst.to_affine(C, msm_mod._bucket_phase(
        C, pts, mag, (perm, ranks), c, s_plain,
        signs=signs, signed=True, overflow=overflow))
    assert bool(np.asarray(wst.affine_eq(got, want)))


def test_all_zero_scalars(points):
    sc = jnp.zeros((N, 16), jnp.uint32)
    got = msm_mod.msm(C, points, sc, c=4)
    assert bool(np.asarray(fp.is_zero(got.z)))
