"""MSM phase-level profiling on the real TPU (round-2 perf work).

Times, separately: the relay round-trip floor, a raw field-mul chain
(scan vs unrolled), digit extraction+sort, and the three bucket-phase stages
(sweep / aggregation / doubling+reduce) of the lane-major engine — to locate
the dominant cost at 2^16 before optimising.

Progress is appended (line-buffered) to experiments/profile_out.txt so a
timed-out run still leaves its partial results.

Usage: python experiments/profile_msm.py [N_LOG=16] [C=8] [PART=all|mul|msm]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.fields import fp
import fp_lanes as fl
    from accumulation_tpu.ops import msm as msm_mod
    import msm_lanes
    from accumulation_tpu.pc.pedersen import _sample_points

    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    part = sys.argv[3] if len(sys.argv) > 3 else "all"
    n = 1 << n_log
    curve = PALLAS
    rng = np.random.default_rng(0)
    logf = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "profile_out.txt"), "a", buffering=1)

    def log(msg):
        logf.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
        print(msg, flush=True)

    dev = jax.devices()[0]
    log(f"=== device={dev}, n=2^{n_log}, c={c}, part={part}")

    def timed(name, fn, reps=3):
        t_c0 = time.time()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm
        log(f"{name:28s} compile+warm {time.time()-t_c0:8.1f} s")
        t0 = time.time()
        for _ in range(reps):
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / reps
        log(f"{name:28s} {dt*1e3:10.2f} ms")
        return dt

    with jax.default_device(dev):
        if part in ("all", "mul"):
            _run_mul_part(curve, rng, timed, log)
        if part in ("all", "msm"):
            _run_msm_part(curve, rng, timed, log, n, c, n_log)


def _run_mul_part(curve, rng, timed, log):
    import jax
    import jax.numpy as jnp
    from accumulation_tpu.fields import fp
import fp_lanes as fl
    if True:
        # relay floor: trivial op + readback
        x0 = jnp.arange(8, dtype=jnp.uint32)
        triv = jax.jit(lambda x: x + 1)
        timed("relay_floor(tiny op)", lambda: triv(x0), reps=5)

        # field-mul chains, lane-major (16, B)
        B = 8192
        K = 32
        a = fl.to_lanes(fp.random_elements(curve.fr, rng, (B,)))
        b = fl.to_lanes(fp.random_elements(curve.fr, rng, (B,)))

        @jax.jit
        def chain_scan(a, b):
            def body(x, _):
                return fl.mul(curve.fr, x, b), None
            out, _ = jax.lax.scan(body, a, None, length=K)
            return out

        @jax.jit
        def chain_unroll(a, b):
            x = a
            for _ in range(K):
                x = fl.mul(curve.fr, x, b)
            return x

        dt_scan = timed(f"fl.mul scan  K={K} B={B}", lambda: chain_scan(a, b))
        dt_unr = timed(f"fl.mul unroll K={K} B={B}", lambda: chain_unroll(a, b))
        # u32 limb-mult roofline estimate: ~3 wide products of 256 u32 muls
        limb_mults = 3 * 256 * B * K
        log(f"  unroll: {limb_mults/dt_unr/1e9:.2f} G u32-mults/s "
            f"(plus ~2x adds/shifts)")

        B2 = 1 << 17
        a2 = fl.to_lanes(fp.random_elements(curve.fr, rng, (B2,)))
        b2 = fl.to_lanes(fp.random_elements(curve.fr, rng, (B2,)))

        @jax.jit
        def chain_unroll8(a, b):
            x = a
            for _ in range(8):
                x = fl.mul(curve.fr, x, b)
            return x

        dt_big = timed(f"fl.mul unroll K=8 B={B2}",
                       lambda: chain_unroll8(a2, b2))
        log(f"  big-batch: {3*256*B2*8/dt_big/1e9:.2f} G u32-mults/s")


def _run_msm_part(curve, rng, timed, log, n, c, n_log):
    import jax
    import jax.numpy as jnp
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import msm as msm_mod
    import msm_lanes
    from accumulation_tpu.pc.pedersen import _sample_points
    with jax.default_device(jax.devices()[0]):
        # MSM phases
        pts = _sample_points(curve, n, b"bench|" + str(n).encode())
        scalars = fp.random_elements(curve.fr, rng, (n,))

        timed("digits_and_sort",
              lambda: msm_mod._digits_and_sort(curve, scalars, c))
        sorted_digits, perm, ranks, _ = msm_mod._digits_and_sort(
            curve, scalars, c)
        s = max(64, 2 * n // (1 << c))
        s = 1 << (s - 1).bit_length()
        log(f"slot bound s={s}")

        for stage in ("sweep", "agg", "full"):
            timed(f"bucket stage={stage}",
                  lambda stage=stage: msm_lanes.bucket_phase_lanes(
                      curve, pts, sorted_digits, (perm, ranks), c, s, stage))

        dt_full = timed("bucket full (again)",
                        lambda: msm_lanes.bucket_phase_lanes(
                            curve, pts, sorted_digits, (perm, ranks), c, s))
        log(f"points/s (bucket only): {n/dt_full:,.0f}")


if __name__ == "__main__":
    main()
