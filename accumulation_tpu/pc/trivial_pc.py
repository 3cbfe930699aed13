"""The trivial (Pedersen linear-hash) polynomial commitment (layer L3).

TPU-native counterpart of `ark_poly_commit::trivial_pc::TrivialPC`
(reference call sites: src/trivial_pc_as/mod.rs:212,299-305,619-632): a
commitment is the Pedersen commitment of the coefficient vector; the opening
proof is the polynomial itself; `check` recommits and re-evaluates.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..ops import poly as poly_ops
from . import pedersen


class TrivialPCKey(NamedTuple):
    pedersen: pedersen.PedersenKey

    @property
    def supported_degree(self) -> int:
        return self.pedersen.supported_num_elems - 1


def setup(curve: CurveSpec, max_degree: int) -> pedersen.PedersenParams:
    return pedersen.setup(curve, max_degree + 1)


def trim(pp: pedersen.PedersenParams, supported_degree: int) -> TrivialPCKey:
    return TrivialPCKey(pedersen.trim(pp, supported_degree + 1))


def commit(curve: CurveSpec, ck: TrivialPCKey, coeffs) -> Affine:
    """coeffs: (D, NLIMBS) Montgomery Fr, D <= supported_degree + 1."""
    return pedersen.commit(curve, ck.pedersen, coeffs)


def commit_batched(curve: CurveSpec, ck: TrivialPCKey, coeffs) -> Affine:
    return pedersen.commit_batched(curve, ck.pedersen, coeffs)


def check(curve: CurveSpec, ck: TrivialPCKey, commitment: Affine, point,
          value, proof_coeffs) -> bool:
    """`check_individual_opening_challenges` analog: recommit + re-evaluate."""
    test_comm = commit(curve, ck, proof_coeffs)
    comm_ok = bool(np.asarray(wst.affine_eq(test_comm, commitment)))
    eval_ok = bool(np.asarray(fp.eq(
        poly_ops.evaluate(curve.fr, proof_coeffs, point), value)))
    return comm_ok and eval_ok
