"""Pallas sweep kernel (ops/msm_pallas.py) vs the XLA fp8 bucket phase.

Runs the kernel in interpreter mode (Mosaic targets TPU; the CPU suite
validates the kernel *body* — the same arithmetic the TPU executes) and
checks the resulting buckets agree with the u32 product engine.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.ops import msm as msm_mod, msm8, msm_pallas
from accumulation_tpu.pc.pedersen import _sample_points

N = 256
C = 8


@pytest.fixture(scope="module")
def fixture():
    curve = PALLAS
    rng = np.random.default_rng(7)
    pts = _sample_points(curve, N, b"pallas-sweep-test")
    scalars = fp.random_elements(curve.fr, rng, (N,))
    mag, signs, ranks, overflow, wmaxes = msm_mod._signed_digits_and_ranks(
        curve, scalars, C)
    s = msm_mod._quantize_slots(int(jnp.max(wmaxes)), N)
    perm = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), mag.shape)
    return curve, pts, mag, signs, ranks, overflow, perm, s


def test_pallas_sweep_matches_u32(fixture, monkeypatch):
    curve, pts, mag, signs, ranks, overflow, perm, s = fixture
    monkeypatch.setattr(msm_pallas, "_INTERPRET", True)
    monkeypatch.setattr(msm8, "_PALLAS_SWEEP", True)
    got = wst.to_affine(curve, msm8.bucket_phase8(
        curve, pts, mag, (perm, ranks), C, s,
        signs=signs, signed=True, overflow=overflow))
    want = wst.to_affine(curve, msm_mod._bucket_phase(
        curve, pts, mag, (perm, ranks), C, s,
        signs=signs, signed=True, overflow=overflow))
    assert bool(np.asarray(wst.affine_eq(got, want)))


def test_pallas_chunk_padding(fixture, monkeypatch):
    """s not a multiple of CHUNK: sentinel-padded steps must be no-ops."""
    curve, pts, mag, signs, ranks, overflow, perm, s = fixture
    monkeypatch.setattr(msm_pallas, "_INTERPRET", True)
    monkeypatch.setattr(msm_pallas, "CHUNK", 3)
    monkeypatch.setattr(msm8, "_PALLAS_SWEEP", True)
    got = wst.to_affine(curve, msm8.bucket_phase8(
        curve, pts, mag, (perm, ranks), C, s,
        signs=signs, signed=True, overflow=overflow))
    want = wst.to_affine(curve, msm_mod._bucket_phase(
        curve, pts, mag, (perm, ranks), C, s,
        signs=signs, signed=True, overflow=overflow))
    assert bool(np.asarray(wst.affine_eq(got, want)))


def test_pallas_vpu_body_matches_u32(fixture, monkeypatch):
    """The hybrid VPU body (roll-accumulate data conv + MXU constant convs,
    fp8._mul_hybrid) must produce identical buckets to the u32 engine."""
    curve, pts, mag, signs, ranks, overflow, perm, s = fixture
    monkeypatch.setattr(msm_pallas, "_INTERPRET", True)
    monkeypatch.setattr(msm_pallas, "_MUL_BODY", "vpu")
    monkeypatch.setattr(msm8, "_PALLAS_SWEEP", True)
    # _sweep_call caches per (curve, nl8, lanes, chunk) but reads _MUL_BODY
    # at build time — drop entries built by the other body's tests
    msm_pallas._sweep_call.cache_clear()
    got = wst.to_affine(curve, msm8.bucket_phase8(
        curve, pts, mag, (perm, ranks), C, s,
        signs=signs, signed=True, overflow=overflow))
    want = wst.to_affine(curve, msm_mod._bucket_phase(
        curve, pts, mag, (perm, ranks), C, s,
        signs=signs, signed=True, overflow=overflow))
    msm_pallas._sweep_call.cache_clear()
    assert bool(np.asarray(wst.affine_eq(got, want)))
