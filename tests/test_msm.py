"""Pippenger MSM tests — executed in a fresh interpreter.

The XLA:CPU compiler deterministically segfaults compiling the N=300 bucket
graphs *after* a long session's worth of other compiles (fresh processes
always succeed), so the real test body lives in tests/msm_suite.py and runs
in a clean subprocess here.
"""

import os
import subprocess
import sys

import pytest


def test_msm_suite_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(here, "msm_suite.py"), "-q", "-o", "addopts=",
         "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=3000,
        cwd=os.path.dirname(here),
    )
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-2000:])
    assert proc.returncode == 0, "msm suite failed in subprocess"
