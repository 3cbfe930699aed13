"""f32-engine MSM benchmark on the real TPU.

Times the sort-free rank extraction and the fp8 bucket phase at the given
sizes; appends durable results to experiments/profile_out.txt.

Usage: python experiments/bench_msm8.py [n_log ...] (default: 16)
Env: BENCH8_C (default 8).
"""

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
    from accumulation_tpu.curves import PALLAS, weierstrass as wst
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import msm as msm_mod, msm8
    from accumulation_tpu.pc.pedersen import _sample_points

    c = int(os.environ.get("BENCH8_C", 8))
    n_logs = [int(a) for a in sys.argv[1:]] or [16]
    curve = PALLAS
    rng = np.random.default_rng(0)
    logf = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "profile_out.txt"), "a", buffering=1)

    def log(msg):
        logf.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
        print(msg, flush=True)

    dev = jax.devices()[0]
    log(f"=== bench_msm8 device={dev}, c={c}, n_logs={n_logs}")

    def timed(name, fn, reps=3):
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        log(f"{name:32s} compile+warm {time.time()-t0:8.1f} s")
        t0 = time.time()
        for _ in range(reps):
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / reps
        log(f"{name:32s} {dt*1e3:10.2f} ms")
        return dt

    with jax.default_device(dev):
        for n_log in n_logs:
            n = 1 << n_log
            pts = _sample_points(curve, n, b"bench|" + str(n).encode())
            scalars = fp.random_elements(curve.fr, rng, (n,))
            dt_r = timed(f"signed_digits_ranks n=2^{n_log}",
                         lambda: msm_mod._signed_digits_and_ranks(
                             curve, scalars, c))
            mag, signs, ranks, overflow, max_count = \
                msm_mod._signed_digits_and_ranks(curve, scalars, c)
            s = msm_mod._quantize_slots(int(jnp.max(max_count)), n)
            log(f"slot bound s={s}")
            perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                    mag.shape)
            dt_b = timed(
                f"bucket_phase8 signed n=2^{n_log} c={c} s={s}",
                lambda: msm8.bucket_phase8(
                    curve, pts, mag, (perm, ranks), c, s,
                    signs=signs, signed=True, overflow=overflow))
            log(f"n=2^{n_log}: {n/(dt_r+dt_b):,.0f} points/s "
                f"(ranks {dt_r*1e3:.1f} ms + bucket {dt_b*1e3:.1f} ms)")
            # correctness spot-check vs the independent u32 engine
            if n_log <= 16:
                got = wst.to_affine(curve, msm8.bucket_phase8(
                    curve, pts, mag, (perm, ranks), c, s,
                    signs=signs, signed=True, overflow=overflow))
                want = wst.to_affine(curve, msm_mod._bucket_phase(
                    curve, pts, mag, (perm, ranks), c, s,
                    signs=signs, signed=True, overflow=overflow))
                ok = bool(np.asarray(wst.affine_eq(got, want)))
                log(f"n=2^{n_log}: correctness vs u32 engine: {ok}")
                assert ok


if __name__ == "__main__":
    main()
