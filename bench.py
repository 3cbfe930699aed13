"""Flagship benchmark: product-path MSM + ipa_pc_as accumulation on the TPU.

Prints ONE JSON line:
  {"metric": "msm_points_per_sec_2e20", "value": N, "unit": "points/s",
   "vs_baseline": R, ...extra keys...}

The timed MSM is the SHIPPED entry point (`ops.msm.msm`: signed digits,
host-synced slot bound, engine dispatch) — not a bench-only variant.

vs_baseline: this machine has no Rust toolchain, so the recorded ratio is
against a pinned external yardstick — desktop-CPU arkworks Pippenger at
2^16..2^20, documented estimate 1.0e6 points/s (ARKWORKS_CPU_MSM_PPS_EST;
see BASELINE.md; the reference publishes nothing).  The round-1 ratio
(38,590 pts/s bench-only lane-engine number, DISAVOWED) is demoted to the
extra key vs_r01_disavowed for cross-round continuity.

Extra keys:
  msm_2e16_pps / msm_2e20_pps   — product MSM throughput
  ipa_as_prove_s / ipa_as_verify_s / ipa_as_decide_s
  ipa_as_accumulations_per_s    — 1 / (prove + verify)

Two-pass scheme semantics: a SAFE pass at 2^BENCH_SCHEME_SAFE_LOG_DEGREE
(default 10) writes the plain ipa_as_* keys first; the TARGET pass at
2^BENCH_SCHEME_LOG_DEGREE (default 16) writes ipa_as_d{logd}_* and, on
full completion, PROMOTES them into the plain keys.  ipa_as_pass
("safe"|"target") says which degree the plain keys describe;
ipa_as_degree always matches them.  A target failure is mirrored into
ipa_as_error (the long-standing contract key) as well as
ipa_as_d{logd}_error.
  adds_per_s / field_muls_per_s / sol_fraction — roofline accounting for the
      2^20 MSM: group-adds actually executed (slot sweep s*w*nb + log-agg +
      doubling chain), 11.5 field muls per add, against an assumed 2.5e12
      f32 FMA/s VPU ceiling at ~15k FMA per redundant-limb field mul
      (fields/fp8.py) — a speed-of-light FRACTION estimate, not a claim.

Env knobs: BENCH_N (default 2^20), BENCH_REPS (3), BENCH_WINDOW_C (8),
BENCH_SKIP_SCHEME=1, BENCH_SCHEME_LOG_DEGREE (default 16 — see the
cold-compile note at the call site), BENCH_SKIP_2E16=1,
BENCH_FORCE_REDUCED=1 (run the REDUCED_UNROLLS fallback graphs from the
start), BENCH_DEADLINE_S (partial-emit watchdog, default 2700).
"""

import json
import os
import sys
import time


def _stage(msg):
    # progress + partial results to stderr: a remote-worker crash late in
    # the run must not lose earlier stages' numbers (the JSON contract line
    # on stdout still prints once at the end)
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

os.environ.setdefault("ACCUM_TPU_UNROLL_CARRIES", "1")
# Pin the point-major u32 engine for recorded numbers (the product
# default; the lane-major alternative was retired to experiments/ for
# cold-compile hostility — see ops/msm.py engine notes).
os.environ.setdefault("ACCUM_TPU_MSM_ENGINE", "u32")

import numpy as np

# BENCH_r01.json, same machine.  DISAVOWED as a product number: it was a
# bench-only lane-engine run with an optimistic fixed slot bound (see
# CLAUDE.md round-2 notes); kept only so vs_baseline stays a like-for-like
# progress ratio across rounds.
R01_MSM_2E16_PPS = 38590.0

# External yardstick (this machine has no Rust toolchain to run the
# reference): desktop/server-CPU arkworks ark-ec Pippenger throughput at
# 2^16..2^20 is commonly reported around 0.5-1.5e6 points/s multi-threaded
# (order of magnitude from public ark-ec 0.4 MSM benchmarks on 8-16 core
# CPUs).  Pinned as 1.0e6 pts/s: a DOCUMENTED ESTIMATE for the
# vs_arkworks_cpu_est ratio, not a measurement.
ARKWORKS_CPU_MSM_PPS_EST = 1.0e6


def _sync(x):
    # a small readback is the only reliable completion barrier on the
    # relayed TPU backend (block_until_ready returns early there)
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf)


# Reduced-graph fallback for the bucket sweep: the remote compile
# helper's memory budget varies by deployment — the default chunk-16
# sweep graph OOM-killed it on 2026-08-20 ("chipless" AOT helper) after
# compiling fine on 2026-08-19.  Once any MSM stage fails, later stages
# go straight to the reduced config instead of re-paying the ~20-min
# hang-then-SIGKILL.
REDUCED_UNROLLS = (4, 2, 2)
# BENCH_FORCE_REDUCED=1: start degraded — proves the fallback graphs
# actually compile+run on the deployment (they are otherwise exercised
# only after a default-graph failure)
_degraded = {"flag": os.environ.get("BENCH_FORCE_REDUCED") == "1"}


def bench_msm(curve, n, c, reps):
    import jax.numpy as jnp
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import msm as msm_mod
    from accumulation_tpu.pc.pedersen import _sample_points

    rng = np.random.default_rng(0)
    pts = _sample_points(curve, n, b"bench|" + str(n).encode())
    scalars = fp.random_elements(curve.fr, rng, (n,))

    unrolls = REDUCED_UNROLLS if _degraded["flag"] else None
    try:
        out = msm_mod.msm(curve, pts, scalars, c=c, unrolls=unrolls)
        _sync(out)  # compile + warm
    except Exception as e:
        if unrolls is not None:
            raise
        _stage(f"msm n={n}: default sweep graph failed to compile "
               f"({type(e).__name__}) — retrying with unrolls="
               f"{REDUCED_UNROLLS}")
        _degraded["flag"] = True
        unrolls = REDUCED_UNROLLS
        out = msm_mod.msm(curve, pts, scalars, c=c, unrolls=unrolls)
        _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = msm_mod.msm(curve, pts, scalars, c=c, unrolls=unrolls)
        _sync(out)
    dt = (time.time() - t0) / reps
    # recover the slot layout the product path used (cached host sync)
    mag, signs, ranks, _, wmaxes = msm_mod._signed_digits_and_ranks(
        curve, scalars, c)
    _, _, _, s, dbl_counts = msm_mod._plan_split(
        mag, signs, ranks, np.asarray(wmaxes), c, n)
    rows = len(dbl_counts) if dbl_counts is not None else 256 // c
    return n / dt, dt, s, rows


def bench_scheme(curve, log_degree, extra=None, suffix=""):
    """ipa_pc_as index/prove/verify/decide at degree 2^log_degree - 1.

    Phase timings are written into `extra` AS EACH PHASE COMPLETES so a
    deadline partial-emit (or a helper crash) mid-stage still records the
    phases that did finish — three rounds of ipa_as numbers were lost to
    all-or-nothing reporting.  `suffix` namespaces the keys (e.g. "_d16")
    so a partial run at one degree cannot mix phases into another
    degree's set.
    """
    if extra is None:
        extra = {}
    k = "ipa_as" + suffix
    if _degraded["flag"]:
        # shrink the fused open's sweep bodies the same way; its graphs
        # have not been traced yet in this process, so mutating the
        # module constants reaches every _bucket_phase trace it makes
        from accumulation_tpu.ops import msm as msm_mod
        (msm_mod.SWEEP_CHUNK, msm_mod.AGG_UNROLL_N,
         msm_mod.DBL_UNROLL_N) = REDUCED_UNROLLS
    from accumulation_tpu.core.accumulation import MakeZK
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.schemes.ipa_pc_as import (
        AtomicASForInnerProductArgPC, InputInstance, PredicateIndex)
    from accumulation_tpu.core.accumulation import InstanceWitnessPair

    deg = (1 << log_degree) - 1
    rng = np.random.default_rng(1)
    scheme = AtomicASForInnerProductArgPC(curve)
    t0 = time.time()
    pp = ipa_pc.setup(curve, deg)
    pk, vk, dk = scheme.index(None, pp, PredicateIndex(deg, deg))
    t_index = time.time() - t0
    extra[k + "_degree"] = deg
    extra[k + "_index_s"] = round(t_index, 2)

    # one real opening claim as the input instance
    coeffs = fp.random_elements(curve.fr, rng, (deg + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, pk.ipa_ck, coeffs)
    value = poly_ops.evaluate(curve.fr, coeffs, point)
    proof = ipa_pc.open(curve, pk.ipa_ck, coeffs, comm, point)
    inst = InputInstance(comm, point, value, proof)
    inputs = [InstanceWitnessPair(inst, None)]

    # warm (compile) pass, then the timed pass
    acc, asp = scheme.prove(pk, inputs, [], MakeZK.Disabled())
    t0 = time.time()
    acc, asp = scheme.prove(pk, inputs, [], MakeZK.Disabled())
    t_prove = time.time() - t0
    extra[k + "_prove_s"] = round(t_prove, 2)

    ok = scheme.verify(vk, [inst], [], acc.instance, asp)
    t0 = time.time()
    ok = scheme.verify(vk, [inst], [], acc.instance, asp)
    t_verify = time.time() - t0
    assert ok, "flagship verify failed"
    extra[k + "_verify_s"] = round(t_verify, 2)
    extra[k + "_accumulations_per_s"] = round(1.0 / (t_prove + t_verify), 4)

    ok_d = scheme.decide(dk, acc)
    t0 = time.time()
    ok_d = scheme.decide(dk, acc)
    t_decide = time.time() - t0
    assert ok_d, "flagship decide failed"
    extra[k + "_decide_s"] = round(t_decide, 2)
    return t_index, t_prove, t_verify, t_decide


def main():
    import signal

    import jax
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        try:
            jax.config.update("jax_platforms", "axon,cpu")
        except Exception:
            pass

    import accumulation_tpu  # noqa: F401
    from accumulation_tpu.curves import PALLAS

    curve = PALLAS
    n = int(os.environ.get("BENCH_N", 1 << 20))
    reps = int(os.environ.get("BENCH_REPS", 3))
    c = int(os.environ.get("BENCH_WINDOW_C", 8))
    extra = {}

    # A kill or stall mid-compile (driver timeout, remote-worker wedge)
    # must not lose the stages that DID complete: emit the contract line
    # with whatever is accumulated so far, then exit.  Two mechanisms:
    # a SIGTERM/SIGINT handler (runs when the interpreter regains control)
    # and a deadline WATCHDOG THREAD — signal handlers cannot run while
    # the main thread is blocked inside a multi-minute XLA compile (C
    # call), a thread can (the compile releases the GIL).
    def _emit_partial(*_a):
        val = extra.get("msm_2e20_pps", extra.get("msm_2e16_pps", 0.0))
        out = {
            "metric": "msm_points_per_sec_partial",
            "value": val,
            "unit": "points/s",
            "vs_baseline": round(val / ARKWORKS_CPU_MSM_PPS_EST, 4),
            "vs_r01_disavowed": round(
                extra.get("msm_2e16_pps", 0.0) / R01_MSM_2E16_PPS, 3),
            "partial": True,
        }
        out.update(extra)
        print(json.dumps(out), flush=True)
        os._exit(1)

    signal.signal(signal.SIGTERM, _emit_partial)
    signal.signal(signal.SIGINT, _emit_partial)

    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "2700"))
    if deadline_s > 0:
        import threading
        t_start = time.time()

        def _watchdog():
            import sys as _sys
            while True:
                time.sleep(15)
                if time.time() - t_start > deadline_s:
                    print(f"[bench] deadline {deadline_s:.0f}s hit — "
                          "emitting partial results", file=_sys.stderr,
                          flush=True)
                    _emit_partial()

        threading.Thread(target=_watchdog, daemon=True).start()

    # The flagship scheme stage runs FIRST: it is the BASELINE headline
    # metric (ipa-pc-as accumulations/s), and on a cold XLA cache the MSM
    # stages alone can eat the whole bench deadline (~35 min per sweep
    # graph on the remote compiler) — were they first, a deadline
    # partial-emit would drop the scheme keys entirely.  Scheme-first
    # means a warm-scheme/cold-MSM cache still records the flagship
    # numbers before the watchdog fires.
    if os.environ.get("BENCH_SKIP_SCHEME") != "1":
        # Default the scheme stage to 2^16: the 2^20 fused-open graph set
        # needs ~1 h of cold remote compiles and its largest round graph
        # has crashed the remote TPU worker 3 of 4 attempts
        # (experiments/r03/prewarm20_*.log) — on a cold cache the 2^20
        # stage cannot complete inside the bench deadline.  2^16 runs the
        # identical code path (fused open, split rounds, mesh-aware MSM)
        # at a compile-feasible size; set BENCH_SCHEME_LOG_DEGREE=20 once
        # a warm cache exists.
        logd = int(os.environ.get("BENCH_SCHEME_LOG_DEGREE", "16"))
        # Two passes: a SAFE small degree first (all graphs are minutes to
        # compile — tail rounds, tiny commit MSM), so a complete flagship
        # phase set exists before the target degree's ~35-min cold commit
        # MSM + big-round compiles are even attempted.  The safe pass is
        # also a literal prewarm for the target: tail-round graphs depend
        # only on the round size L, so degree 2^10's rounds ARE the target
        # open's rounds below 2^10.  The safe pass writes the plain
        # ipa_as_* keys; the target pass writes ipa_as_d{logd}_* and, on
        # FULL completion, promotes them to the plain keys — a partial
        # target run can never mix degrees inside one key set.
        safe_logd = int(os.environ.get("BENCH_SCHEME_SAFE_LOG_DEGREE", "10"))
        if 0 < safe_logd < logd:
            try:
                _stage(f"ipa_pc_as at degree 2^{safe_logd}-1 (safe) ...")
                ti, tp, tv, td = bench_scheme(curve, safe_logd, extra)
                _stage(f"ipa_pc_as d{safe_logd}: index {ti:.1f}s prove "
                       f"{tp:.1f}s verify {tv:.1f}s decide {td:.1f}s")
                extra["ipa_as_pass"] = "safe"
            except Exception as e:
                extra["ipa_as_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            _stage(f"ipa_pc_as at degree 2^{logd}-1 ...")
            ti, tp, tv, td = bench_scheme(curve, logd, extra, f"_d{logd}")
            _stage(f"ipa_pc_as: index {ti:.1f}s prove {tp:.1f}s "
                   f"verify {tv:.1f}s decide {td:.1f}s")
            for ph in ("degree", "index_s", "prove_s", "verify_s",
                       "accumulations_per_s", "decide_s"):
                extra[f"ipa_as_{ph}"] = extra[f"ipa_as_d{logd}_{ph}"]
            extra["ipa_as_pass"] = "target"
            # the plain keys now describe a COMPLETE target run — a stale
            # safe-pass error would misreport it (ADVICE r04)
            extra.pop("ipa_as_error", None)
        except Exception as e:  # keep the headline metric even if this fails
            extra[f"ipa_as_d{logd}_error"] = f"{type(e).__name__}: {e}"[:200]
            # mirror into the long-standing contract key unless the safe
            # pass already recorded its own failure there (ADVICE r04)
            extra.setdefault("ipa_as_error", extra[f"ipa_as_d{logd}_error"])

    # hp-as stage (BASELINE config #2, len 2^14) — opt-in: the first TPU
    # scheme number outside ipa_pc_as.  Off by default so the driver's
    # deadline stays budgeted for the flagship + MSM stages.
    if os.environ.get("BENCH_HP_AS") == "1":
        try:
            hp_log = int(os.environ.get("BENCH_HP_LOG_LEN", "14"))
            _stage(f"hp_as at len 2^{hp_log} ...")
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "examples"))
            from scaling_as import profile_hp
            r = profile_hp(1 << hp_log, np.random.default_rng(2), False)
            for ph in ("index", "prove", "verify", "decide"):
                extra[f"hp_as_{ph}_s"] = round(r[ph] / 1e3, 2)
            extra["hp_as_len"] = 1 << hp_log
            _stage(f"hp_as: index {r['index']/1e3:.1f}s prove "
                   f"{r['prove']/1e3:.1f}s verify {r['verify']/1e3:.1f}s "
                   f"decide {r['decide']/1e3:.1f}s")
        except Exception as e:
            extra["hp_as_error"] = f"{type(e).__name__}: {e}"[:200]
            _stage(f"hp_as FAILED: {extra['hp_as_error']}")

    pps_16 = None
    if os.environ.get("BENCH_SKIP_2E16") != "1":
        try:
            _stage("msm 2^16 ...")
            pps_16, dt16, s16, _ = bench_msm(curve, 1 << 16, c, reps)
            extra["msm_2e16_pps"] = round(pps_16, 1)
            extra["msm_2e16_slot_bound"] = s16
            _stage(f"msm 2^16: {pps_16:,.0f} pts/s "
                   f"(dt {dt16*1e3:.0f} ms, s={s16})")
        except Exception as e:  # record and keep going — never die JSON-less
            extra["msm_2e16_error"] = f"{type(e).__name__}: {e}"[:200]
            _stage(f"msm 2^16 FAILED: {extra['msm_2e16_error']}")

    pps_n = None
    try:
        _stage(f"msm n={n} ...")
        pps_n, dt_n, s_n, rows_n = bench_msm(curve, n, c, reps)
        extra["msm_2e20_pps" if n == 1 << 20 else f"msm_n{n}_pps"] = \
            round(pps_n, 1)
        _stage(f"msm n={n}: {pps_n:,.0f} pts/s "
               f"(dt {dt_n*1e3:.0f} ms, s={s_n})")

        # roofline accounting for the big MSM (model: utils/profiling.py)
        from accumulation_tpu.utils import profiling
        rl = profiling.msm_roofline(n, c, s_n, rows_n, dt_n)
        extra["msm_adds_per_s"] = round(rl.adds_per_s, 0)
        extra["field_muls_per_s"] = round(rl.field_muls_per_s, 0)
        extra["sol_fraction"] = round(rl.sol_fraction, 4)
    except Exception as e:
        extra["msm_big_error"] = f"{type(e).__name__}: {e}"[:200]
        _stage(f"msm n={n} FAILED: {extra['msm_big_error']}")
    if _degraded["flag"]:
        extra["degraded_unrolls"] = list(REDUCED_UNROLLS)

    headline = pps_n if pps_n is not None else (pps_16 or 0.0)
    out = {
        "metric": "msm_points_per_sec_2e20" if n == 1 << 20
        else f"msm_points_per_sec_n{n}",
        "value": round(headline, 1),
        "unit": "points/s",
        "vs_baseline": round(headline / ARKWORKS_CPU_MSM_PPS_EST, 4),
        "vs_baseline_note": "ratio vs pinned desktop-CPU arkworks Pippenger "
                            "estimate (1.0e6 pts/s, documented estimate — "
                            "no Rust toolchain on this machine)",
        "vs_r01_disavowed": round(
            (pps_16 / R01_MSM_2E16_PPS) if pps_16 else 0.0, 3),
    }
    out.update(extra)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
