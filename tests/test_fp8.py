"""Redundant-limb f32 field engine (fields/fp8) vs the u32 engine.

The fp8 engine is the TPU MSM fast path; exactness of every op against the
independently-tested u32 Montgomery engine is the correctness contract
(engine design + bound proofs: fields/fp8.py docstrings)."""

import numpy as np
import jax.numpy as jnp
import pytest

from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp, fp8


@pytest.fixture(scope="module")
def elems(rng_mod):
    f = PALLAS.fq
    a = fp.random_elements(f, rng_mod, (48,))
    b = fp.random_elements(f, rng_mod, (48,))
    return f, a, b, fp8.to8(f, a), fp8.to8(f, b)


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(20260817)


def _eq(f, got8, want_u32):
    return np.array_equal(np.asarray(fp8.from8(f, got8)), np.asarray(want_u32))


def test_roundtrip(elems):
    f, a, _, a8, _ = elems
    assert _eq(f, a8, a)


def test_mul_add_sub(elems):
    f, a, b, a8, b8 = elems
    assert _eq(f, fp8.mul(f, a8, b8), fp.mul(f, a, b))
    assert _eq(f, fp8.square(f, a8), fp.square(f, a))
    assert _eq(f, fp8.add(f, a8, b8), fp.add(f, a, b))
    assert _eq(f, fp8.sub(f, a8, b8), fp.sub(f, a, b))
    assert _eq(f, fp8.sub(f, b8, a8), fp.sub(f, b, a))


def test_chained_redundancy(elems):
    """(a+b)(a-b) + b^2 == a^2 — stresses redundant-limb propagation."""
    f, a, b, a8, b8 = elems
    lhs = fp8.add(f, fp8.mul(f, fp8.add(f, a8, b8), fp8.sub(f, a8, b8)),
                  fp8.mul(f, b8, b8))
    assert _eq(f, lhs, fp.square(f, a))


def test_edge_values(elems):
    f = PALLAS.fq
    specials = fp.array_from_ints(f, [0, 1, f.modulus - 1, f.modulus // 2])
    s8 = fp8.to8(f, specials)
    assert _eq(f, fp8.mul(f, s8, s8), fp.mul(f, specials, specials))
    assert _eq(f, fp8.sub(f, s8, fp8.one(f, (4,))),
               fp.sub(f, specials, jnp.broadcast_to(
                   jnp.asarray(f.one_mont), specials.shape)))


def test_limb_bound_invariant(elems):
    """Public ops keep limbs <= 260 (the exactness precondition)."""
    f, a, b, a8, b8 = elems
    for out in (fp8.mul(f, a8, b8), fp8.add(f, a8, b8), fp8.sub(f, a8, b8)):
        assert float(jnp.max(out)) <= 260.0
