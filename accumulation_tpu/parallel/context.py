"""Active-mesh context: transparent multi-chip dispatch for the hot kernels.

The reference parallelises with rayon behind a Cargo feature — callers don't
thread a thread-pool through every API (SURVEY.md §2.3).  The TPU-native
equivalent of that ergonomics: a process-wide *active mesh*.  When set, the
product MSM entry points (`ops/msm.py`) route length-n work through the
mesh-sharded kernels in `parallel/sharded.py`, so every scheme driver
(Pedersen commits, IPA folds, hp t-vec commits) scales across chips with no
signature changes.

    from accumulation_tpu.parallel import context, sharded
    with context.use_mesh(sharded.make_mesh()):
        scheme.prove(...)          # MSMs now run sharded over ICI
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

_ACTIVE_MESH = None


def set_mesh(mesh) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_mesh():
    return _ACTIVE_MESH


@contextmanager
def use_mesh(mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev
