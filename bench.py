"""Flagship benchmark: Pippenger MSM throughput on the TPU.

Prints ONE JSON line:
  {"metric": "msm_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": R}

vs_baseline is the speedup over the same kernel on this machine's CPU
backend (the reference publishes no numbers — BASELINE.md; the Rust toolchain
is not available in this image, so the measured stand-in baseline is the
XLA-CPU build of the identical algorithm at a scaled-down size).

Env knobs: BENCH_N (default 2^16), BENCH_REPS (3), BENCH_WINDOW_C (8),
BENCH_SKIP_CPU=1, BENCH_N_CPU (default 2^12).
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("ACCUM_TPU_UNROLL_CARRIES", "1")

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    import accumulation_tpu  # noqa: F401
    from accumulation_tpu.curves import PALLAS, weierstrass as wst
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import msm as msm_mod
    from accumulation_tpu.ops import msm_lanes
    from accumulation_tpu.pc.pedersen import _sample_points

    curve = PALLAS
    n = int(os.environ.get("BENCH_N", 1 << 16))
    reps = int(os.environ.get("BENCH_REPS", 3))
    c = int(os.environ.get("BENCH_WINDOW_C", 8))
    rng = np.random.default_rng(0)

    def run_msm(device, n_pts, reps_n, lanes: bool):
        # lanes=True: lane-major engine (limb axis in sublanes, batch in VPU
        # lanes) — the fast TPU path; the CPU baseline stays on the standard
        # layout (its giant unrolled graph compiles impractically on XLA:CPU).
        if lanes:
            bucket = msm_lanes.bucket_phase_lanes
        else:
            # thin unrolls: XLA:CPU takes ~1h on the fat TPU-shaped graph
            bucket = functools.partial(
                msm_mod._bucket_phase, unrolls=(2, 1, 1))
        with jax.default_device(device):
            pts = _sample_points(curve, n_pts, b"bench|" + str(n_pts).encode())
            scalars = fp.random_elements(curve.fr, rng, (n_pts,))
            # fixed slot bound: uniform digits make overflow vanishingly rare
            sorted_digits, perm, ranks, _ = msm_mod._digits_and_sort(
                curve, scalars, c)
            s = max(64, 2 * n_pts // (1 << c))
            s = 1 << (s - 1).bit_length()
            out = bucket(curve, pts, sorted_digits, (perm, ranks), c, s)
            # a small readback is the only reliable completion barrier on the
            # relayed TPU backend (block_until_ready returns early there)
            np.asarray(out.x)  # compile + warm
            t0 = time.time()
            for _ in range(reps_n):
                sorted_digits, perm, ranks, _ = msm_mod._digits_and_sort(
                    curve, scalars, c)
                out = bucket(curve, pts, sorted_digits, (perm, ranks), c, s)
                np.asarray(out.x)
            dt = (time.time() - t0) / reps_n
        return n_pts / dt

    tpu_dev = jax.devices()[0]
    use_lanes = os.environ.get("BENCH_LANES", "1") == "1"
    pps = run_msm(tpu_dev, n, reps, lanes=use_lanes)

    vs_baseline = 0.0
    if os.environ.get("BENCH_SKIP_CPU") != "1":
        try:
            cpu = jax.devices("cpu")[0]
            n_cpu = int(os.environ.get("BENCH_N_CPU", 1 << 12))
            cpu_pps = run_msm(cpu, n_cpu, 1, lanes=False)
            vs_baseline = pps / cpu_pps
        except Exception:
            vs_baseline = 0.0

    print(json.dumps({
        "metric": "msm_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
