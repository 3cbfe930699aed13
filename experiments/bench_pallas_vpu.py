"""Measure the Pallas sweep bodies against the u32 XLA sweep on the TPU.

The round-3 verdict's kernel task: the hybrid VPU body (fp8._mul_hybrid —
roll-accumulate data conv on the VPU + constant REDC convs on the MXU)
must beat the shipped u32 XLA sweep by >=3x at 2^16/c=8, or produce the
profile that kills it.  This times, at the SAME slot layout:

  * u32 full msm       (ops/msm.msm — the shipped product path; r03
    profiling put its sweep at ~0.8 s of the 1.8 s total at 2^16/c=8)
  * Pallas sweep       (ops/msm_pallas.sweep_pallas, kernel isolated) with
    the body chosen by ACCUM_TPU_PALLAS_MUL (vpu | mxu) and
    CHUNK/LANE_BLK env knobs
  * fp8+pallas full    (ops/msm8.msm8 with the Pallas sweep)

Progress appends to the log file given as argv[2] (default stderr only).
Usage: env ACCUM_TPU_PALLAS_MUL=vpu python experiments/bench_pallas_vpu.py
           [N_LOG=16] [C=8]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ACCUM_TPU_UNROLL_CARRIES", "1")
os.environ.setdefault("ACCUM_TPU_MSM_ENGINE", "u32")

import numpy as np


def log(msg):
    print(f"[pallas-vpu] {msg}", file=sys.stderr, flush=True)


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
    from accumulation_tpu.ops import msm as msm_mod, msm8, msm_pallas
    from accumulation_tpu.pc.pedersen import _sample_points

    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << n_log
    curve = PALLAS
    rng = np.random.default_rng(0)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0])

    def timeit(label, fn, reps=3):
        out = fn()
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            sync(fn())
        dt = (time.time() - t0) / reps
        log(f"{label}: {dt*1e3:.0f} ms")
        return dt

    pts = _sample_points(curve, n, b"pallas-vpu|" + str(n).encode())
    scalars = fp.random_elements(curve.fr, rng, (n,))
    mag, signs, ranks, overflow, wmaxes = msm_mod._signed_digits_and_ranks(
        curve, scalars, c)
    s = msm_mod._quantize_slots(int(jnp.max(wmaxes)), n)
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mag.shape)
    log(f"n=2^{n_log} c={c} s={s} body={msm_pallas._MUL_BODY} "
        f"chunk={msm_pallas.CHUNK} lane_blk={msm_pallas.LANE_BLK}")

    # full u32 product path (the shipped MSM — includes digits + sweep +
    # aggregation; r03 profiling put the sweep at ~0.8 s of the 1.8 s
    # total at 2^16/c=8)
    t_u32 = timeit("u32 full msm (shipped)", lambda: msm_mod.msm(
        curve, pts, scalars, c=c))

    # Pallas sweep kernel, isolated: prepare (untimed), then the kernel
    slots_t, px, py, pinf = msm8._prepare8(
        curve, pts, mag, (perm, ranks), c, s, signs=signs, signed=True)
    sync((slots_t, px, py, pinf))
    t_pal = timeit("pallas sweep kernel", lambda: msm_pallas.sweep_pallas(
        curve, px, py, pinf, slots_t, s, n, msm_pallas.CHUNK))

    # full fp8 path with the Pallas sweep (prepare + kernel + combine)
    msm8._PALLAS_SWEEP = True
    t_fp8 = timeit("fp8+pallas full msm", lambda: msm8.msm8(
        curve, pts, scalars, c=c))

    log(f"RESULT u32_full={t_u32:.3f}s pallas_sweep({msm_pallas._MUL_BODY})="
        f"{t_pal:.3f}s fp8_pallas_full={t_fp8:.3f}s "
        f"(r03 u32 sweep-only baseline ~0.8s at 2^16; need kernel >=3x "
        f"faster than that, i.e. <=0.27s)")

    # correctness spot-check at the full-msm level: route the fp8 path
    # through the pallas sweep and compare against the u32 product path
    if os.environ.get("PALLAS_VPU_CHECK", "1") == "1":
        from accumulation_tpu.curves import weierstrass as wst
        msm8._PALLAS_SWEEP = True
        got = wst.to_affine(curve, msm8.bucket_phase8(
            curve, pts, mag, (perm, ranks), c, s,
            signs=signs, signed=True, overflow=overflow))
        want = wst.to_affine(curve, msm_mod._bucket_phase(
            curve, pts, mag, (perm, ranks), c, s,
            signs=signs, signed=True, overflow=overflow))
        ok = bool(np.asarray(wst.affine_eq(got, want)))
        log(f"on-device correctness vs u32: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
