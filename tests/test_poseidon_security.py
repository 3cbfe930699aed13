"""Poseidon instance security margins (round-1 verdict, weak #4).

The shipped RF=8 / RP=56 / t=3 / alpha=5 instance must clear the Poseidon
paper's round-number bounds (statistical + interpolation + Groebner, with
the authors' +2 full / +7.5% total margin) and the GRS invariant-subspace
condition, for every field the framework instantiates a sponge over.
"""

import pytest

from accumulation_tpu.fields.bls12_381 import FQ381
from accumulation_tpu.fields.pasta import FQ, FR
from accumulation_tpu.ops import poseidon_security as ps


@pytest.mark.parametrize("spec", [FQ, FR, FQ381],
                         ids=lambda s: s.name)
def test_round_numbers_and_mds(spec):
    report = ps.verify_instance(spec)
    assert report["rf"] >= report["rf_min_stat"] + 2
    assert report["margin_total"] > 0
    assert report["mds_sbox_orbit_full_rank"]


def test_orbit_check_detects_bad_matrix(monkeypatch):
    """A diagonal (invariant-subspace-riddled) linear layer must fail."""
    from accumulation_tpu.ops import poseidon

    def fake_params(spec):
        return None, ((1, 0, 0), (0, 2, 0), (0, 0, 3))

    monkeypatch.setattr(ps.poseidon, "poseidon_params", fake_params)
    assert not ps.mds_sbox_orbit_full_rank(FQ)
