"""Test configuration: CPU backend with an 8-device virtual mesh.

Must run before any jax import (the axon TPU plugin would otherwise claim the
backend and route every compile through the remote tunnel).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's parallel LLVM codegen has segfaulted on large late-session
# compiles (cumulative JIT state); single-threaded codegen is sturdier.
if "xla_cpu_parallel_codegen_split_count" not in _flags:
    _flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax

# The axon TPU plugin pins jax_platforms at interpreter startup (sitecustomize
# register()); env vars set after that are ignored, so override the config
# directly before any backend initialisation.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
