"""accumulation_tpu: a TPU-native accumulation-schemes framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
`arkworks-rs/accumulation` (mounted read-only at /root/reference): accumulation
schemes for Hadamard products, IPA-PC openings, trivial-PC openings and an
R1CS NARK, plus the algebra/commitment/transcript stack they sit on.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the limb-tensor kernels produce sizeable
# HLO per unique shape; caching compiles across processes keeps test/bench
# startup fast.  The directory is keyed by the platform/flags config:
# XLA:CPU AOT entries reloaded across processes with different backend
# configs can carry mismatched machine features (observed SIGSEGV), so each
# config gets its own consistent cache.
import hashlib as _hashlib

_cfg = (_os.environ.get("JAX_PLATFORMS", "") + "|"
        + _os.environ.get("XLA_FLAGS", ""))
_key = _hashlib.blake2b(_cfg.encode(), digest_size=6).hexdigest()
_cache_dir = _os.environ.get(
    "ACCUMULATION_TPU_XLA_CACHE",
    _os.path.expanduser(f"~/.cache/accumulation_tpu_xla-{_key}"),
)
# XLA:CPU executable serialisation has segfaulted writing cache entries for
# some of the large limb-kernel graphs, so the persistent cache stays off for
# the CPU test backend (one pytest process amortises compiles in-memory);
# the remote-compiled TPU backend depends on it and keeps it on.
_on_cpu = "cpu" in _os.environ.get("JAX_PLATFORMS", "")
if not _on_cpu or _os.environ.get("ACCUM_TPU_FORCE_CACHE") == "1":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
