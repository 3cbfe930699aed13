"""IPA open/check under the hierarchical mesh — isolated in its own file.

The fold loop compiles one sharded bit-serial MSM graph per round size;
that late-compile volume segfaults a loaded XLA:CPU worker (the known
crash — CLAUDE.md), so this lives in a separate xdist worker via
--dist loadfile.
"""

import jax
import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.parallel import context, multihost

C = PALLAS


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return multihost.make_mesh_2d(2, 4)


def test_ipa_open_check_under_mesh(mesh2d, rng):
    """End-to-end IPA commit/open/check with every fold-round MSM routed
    through the hierarchical grid (rounds whose size stops dividing the
    grid fall back to single-device — the dispatch guard in msm())."""
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc

    deg = 31
    pp = ipa_pc.setup(C, deg)
    ck = ipa_pc.trim(pp, deg)
    coeffs = fp.random_elements(C.fr, rng, (deg + 1,))
    point = fp.random_elements(C.fr, rng, ())
    with context.use_mesh(mesh2d):
        comm = ipa_pc.commit(C, ck, coeffs)
        value = poly_ops.evaluate(C.fr, coeffs, point)
        proof = ipa_pc.open(C, ck, coeffs, comm, point)
        assert ipa_pc.check(C, ck, comm, point, value, proof)
    # the mesh path must produce a proof the single-device path accepts
    assert ipa_pc.check(C, ck, comm, point, value, proof)


def test_fused_open_sharded_rounds(mesh2d, rng):
    """The FUSED on-device open (the product prover) under the mesh: rounds
    big enough to shard (half >= 8 * MESH_MIN_LOCAL here) run their two
    cross-term MSMs through shard_map over the ("dcn","ici") grid; the
    result must be byte-identical to the single-device fused proof (same
    transcript, exact arithmetic — round-2 verdict weak #5)."""
    from accumulation_tpu.jit import ipa_open_fused as fo
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc

    deg = 255  # n = 256: first round half=128 -> 16/shard (sharded),
    # second half=64 -> 8/shard < MESH_MIN_LOCAL (single-device)
    pp = ipa_pc.setup(C, deg)
    ck = ipa_pc.trim(pp, deg)
    coeffs = fp.random_elements(C.fr, rng, (deg + 1,))
    point = fp.random_elements(C.fr, rng, ())
    comm = ipa_pc.commit(C, ck, coeffs)
    value = poly_ops.evaluate(C.fr, coeffs, point)

    # the plan really does shard the first round under this mesh
    big, _tail = fo.round_plan(256, mesh2d)
    assert fo._mesh_shardable(mesh2d, big[0][1] // 2)  # pivot size Lp

    proof_single = fo.open_fused(C, ck, coeffs, comm, point)
    with context.use_mesh(mesh2d):
        proof_mesh = fo.open_fused(C, ck, coeffs, comm, point)
    # Proof is a plain dataclass (NOT a pytree — tree_leaves returns the
    # object itself); byte-compare the canonical serialization instead
    from accumulation_tpu.utils import serialize
    assert serialize.serialize_ipa_proof(C, proof_single) == \
        serialize.serialize_ipa_proof(C, proof_mesh)
    assert ipa_pc.check(C, ck, comm, point, value, proof_mesh)
