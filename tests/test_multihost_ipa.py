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


def test_fused_open_sharded_rounds():
    """The FUSED open's shard_map byte-identity — run in a FRESH
    interpreter (tests/fused_sharded_suite.py): its sharded round graphs
    segfault a loaded xdist worker via the known XLA:CPU late-compile
    crash (three "node down" runs in r04), while a clean process always
    passes.  Same isolation pattern as tests/test_msm.py."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "xla_cpu_parallel_codegen_split_count" not in flags:
        flags += " --xla_cpu_parallel_codegen_split_count=1"
    env["XLA_FLAGS"] = flags.strip()
    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(here, "fused_sharded_suite.py"), "-q", "-o",
         "addopts=", "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=3000,
        cwd=os.path.dirname(here),
    )
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-2000:])
    assert proc.returncode == 0, "fused sharded suite failed in subprocess"
