"""Fused on-device IPA opening prover vs the host-sponge path.

The fused prover (jit/ipa_open_fused.py) must produce the byte-identical
Proof for identical inputs — same transcript spec, device sponge
(reference hot path: /root/reference/src/ipa_pc_as/mod.rs:424-472)."""

import numpy as np
import jax.numpy as jnp
import pytest

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.jit import ipa_open_fused
from accumulation_tpu.ops import poly as poly_ops
from accumulation_tpu.pc import ipa_pc


# deg 255: the first fold round's halves (128) cross SMALL_N_THRESHOLD,
# so the fused rounds run the STATIC bucket sweep with the top-window
# replica split (_static_sweep) — the 7/15 cases only cover bit-serial
@pytest.mark.parametrize("deg", [7, 15, 255])
def test_fused_matches_host(rng, deg):
    curve = PALLAS
    pp = ipa_pc.setup(curve, deg)
    ck = ipa_pc.trim(pp, deg)
    coeffs = fp.random_elements(curve.fr, rng, (deg + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs)

    p_host = ipa_pc.open_host(curve, ck, coeffs, comm, point)
    p_fused = ipa_open_fused.open_fused(curve, ck, coeffs, comm, point)

    for name in ("l_vec", "r_vec", "final_comm_key"):
        a, b = getattr(p_host, name), getattr(p_fused, name)
        assert bool(np.asarray(jnp.all(wst.affine_eq(a, b)))), name
    assert np.array_equal(np.asarray(p_host.c), np.asarray(p_fused.c))

    value = poly_ops.evaluate(curve.fr, coeffs, point)
    assert ipa_pc.check(curve, ck, comm, point, value, p_fused)


def test_fused_with_rand(rng):
    """Revealed-randomness variant follows the same transcript."""
    curve = PALLAS
    deg = 7
    pp = ipa_pc.setup(curve, deg)
    ck = ipa_pc.trim(pp, deg)
    coeffs = fp.random_elements(curve.fr, rng, (deg + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    rand = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs, randomness=rand)

    p_host = ipa_pc.open_host(curve, ck, coeffs, comm, point, rand=rand)
    p_fused = ipa_open_fused.open_fused(
        curve, ck, coeffs, comm, point, rand=rand)
    assert np.array_equal(np.asarray(p_host.c), np.asarray(p_fused.c))
    assert bool(np.asarray(jnp.all(wst.affine_eq(
        p_host.final_comm_key, p_fused.final_comm_key))))
