"""Kernel-level profiling + roofline accounting (SURVEY.md §5 tracing).

The reference's observability is the constraint-cost profiler
(`print_costs_breakdown`, /root/reference/src/constraints.rs:206-306 —
mirrored by `constraints.verifier.costs_breakdown`) plus wall-clock prints
in the examples.  On TPU the equivalent first-class tools are:

  * `stage(name)` — wall-clock stage timer whose exit barrier is a small
    device readback (the only reliable completion barrier on the relayed
    axon backend; `block_until_ready` returns early there);
  * `trace(logdir)` — `jax.profiler` trace context for xprof/tensorboard
    kernel timelines (works on CPU and TPU backends);
  * `msm_roofline(...)` — the speed-of-light model for the Pippenger
    bucket phase: group-adds actually executed -> field muls -> an
    FMA-equivalent fraction of the chip's VPU ceiling.  Model constants
    are documented estimates, not measurements.

`experiments/profile_msm.py` drives these against the real TPU per stage;
`bench.py` reports `sol_fraction` from the same model so every recorded
benchmark carries its roofline context.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np

# --- speed-of-light model constants (documented estimates) ---------------
FMA_PER_FIELD_MUL = 15000.0   # redundant-f32 mul: 3 skew convs + passes
MULS_PER_MIXED_ADD = 11.5     # RCB15 mixed add, field muls+squares
VPU_F32_FMA_PER_S = 2.5e12    # assumed v5e VPU f32 ceiling


def sync(x) -> None:
    """Completion barrier: a small readback of one leaf."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf)


@contextlib.contextmanager
def stage(name: str, out=None, result=None):
    """Times a stage; on exit syncs `result` (if given) and records
    (name, seconds) into `out` (a list) and stderr."""
    import sys
    t0 = time.time()
    yield
    if result is not None:
        sync(result)
    dt = time.time() - t0
    if out is not None:
        out.append((name, dt))
    print(f"[profile] {name}: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (xprof): kernel timelines under `logdir`."""
    import jax
    with jax.profiler.trace(logdir):
        yield


@dataclass
class MsmRoofline:
    adds: float            # group adds executed
    adds_per_s: float
    field_muls_per_s: float
    sol_fraction: float    # fraction of the assumed VPU ceiling


def msm_roofline(n: int, c: int, s: int, w_rows: int, dt_s: float
                 ) -> MsmRoofline:
    """Roofline accounting for one Pippenger MSM run.

    n: points; c: window bits; s: static slot depth actually swept;
    w_rows: window rows swept (> 256/c when the hot top window is split);
    dt_s: measured wall-clock.  Counts sweep + log-depth aggregation +
    batched doubling-chain adds — the work the device really executed,
    not the classic ~W*N estimate.
    """
    nb = (1 << (c - 1)) + 1
    w = 256 // c
    sweep_adds = s * w_rows * nb
    agg_adds = w_rows * nb * max(1, (nb - 1).bit_length())
    dbl_adds = c * (w - 1) * w
    adds = sweep_adds + agg_adds + dbl_adds
    adds_per_s = adds / dt_s
    fmuls = adds_per_s * MULS_PER_MIXED_ADD
    return MsmRoofline(
        adds=adds, adds_per_s=adds_per_s, field_muls_per_s=fmuls,
        sol_fraction=fmuls * FMA_PER_FIELD_MUL / VPU_F32_FMA_PER_S)
