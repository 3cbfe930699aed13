"""Sharded fused-open byte-identity — executed in a fresh interpreter.

The fused open's sharded round graphs are among the heaviest XLA:CPU
compiles in the suite; compiled late in a loaded xdist worker they hit the
known deterministic late-compile segfault (three "node down" runs in r04 —
experiments/r04/fused_tests3.log), while a fresh process always succeeds.
The real test body lives here and tests/test_multihost_ipa.py runs it in a
clean subprocess (the tests/msm_suite.py pattern).

The round plan is pinned SMALL (deg 63, one pivot, per-shard floor 4) so a
cold process compiles ~6 graphs instead of ~10: what this file attests is
the shard_map transcript identity, not the tail-group shapes (covered at
CPU defaults by test_jit_pipeline).
"""

import os

import jax
import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.jit import ipa_open_fused as fo
from accumulation_tpu.parallel import context, multihost

C = PALLAS

# mesh shape override so the driver dryrun can run this file at its own
# device count (FUSED_SUITE_MESH="dcn,ici"); default matches the test
# suite's 8 virtual devices
_MESH = tuple(int(x) for x in
              os.environ.get("FUSED_SUITE_MESH", "2,4").split(","))
_NDEV = _MESH[0] * _MESH[1]

# one graph set for every big round + a shard floor sized so n=64's big
# rounds (half=32) shard over the whole grid (module-level: set before
# any open_fused trace).  TAIL_MAX=2 pins the tail to the single L=2
# round: the CPU-default [8,4]/[2] tail groups are the suite's slowest
# XLA:CPU compiles (~10 min each under load) and their group-boundary
# threading is already covered at CPU defaults by test_jit_pipeline —
# here every round above L=2 pads into the shared 64-pivot graph set.
fo._PIVOTS = (64,)
fo.MESH_MIN_LOCAL = max(1, 32 // _NDEV)
fo.TAIL_MAX, fo.TAIL_GROUP = 2, 1


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.devices()) < _NDEV:
        pytest.skip(f"needs {_NDEV} virtual devices")
    return multihost.make_mesh_2d(*_MESH)


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


def test_fused_open_sharded_rounds(mesh2d, rng):
    """The FUSED on-device open (the product prover) under the mesh: rounds
    big enough to shard run their two cross-term MSMs through shard_map
    over the ("dcn","ici") grid; the result must be byte-identical to the
    single-device fused proof (same transcript, exact arithmetic —
    round-2 verdict weak #5)."""
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc

    deg = 63  # n = 64: big rounds all pad to the 64 pivot; half=32 ->
    # 4 points/shard over 8 devices (sharded via MESH_MIN_LOCAL=4)
    pp = ipa_pc.setup(C, deg)
    ck = ipa_pc.trim(pp, deg)
    coeffs = fp.random_elements(C.fr, rng, (deg + 1,))
    point = fp.random_elements(C.fr, rng, ())
    comm = ipa_pc.commit(C, ck, coeffs)
    value = poly_ops.evaluate(C.fr, coeffs, point)

    # the plan really does shard the big rounds under this mesh
    big, _tail = fo.round_plan(deg + 1, mesh2d)
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
