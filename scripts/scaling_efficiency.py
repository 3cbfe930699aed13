"""Modeled multi-chip MSM scaling efficiency, measured on ONE real chip.

Only one physical TPU is reachable in this environment, so true 1->D
scaling cannot be timed directly.  What CAN be measured exactly on one
chip is each term of the D-chip execution model of the sharded prover
(jit/ipa_open_fused._msm_static_pair_sharded / parallel/sharded.py):

  T_D(n) = T_chip(n/D, s(n/D))  +  T_combine(D)

  * T_chip(n/D, s): the per-chip digits + static-bound bucket sweep at the
    shard size — timed here by dispatching the EXACT graphs the sharded
    fused prover runs per shard (`_signed_digits_and_ranks` +
    `jit.ipa_open_fused._half_sweep` with the per-shard Poisson slot bound
    `_slot_bound(n/D, c)` — the same bound `round_plan` gives a mesh);
  * T_combine(D): a log2(D) tree of batched group adds over the gathered
    partials — a fixed-shape kernel also timed on-chip (the ICI/DCN wire
    time for D*3*64 B is below relay timing resolution and is bounded
    above by the measured relay floor, included as `relay_floor_s`).

  efficiency(D) = T_1(n) / (D * T_D(n))

Writes one JSON line (SCALING_r*.json contract) with T_1, per-shard and
combine terms, and modeled efficiency.  D values are chosen so the shard
sizes coincide with graphs the fused-open prewarm already compiled
(halves of the power-of-4 pivots: n/D in {2^19, 2^17, 2^15} at n=2^20 ->
D in {2, 8, 32}); pass explicit D values as argv[3..] to override.

Usage: python scripts/scaling_efficiency.py [N_LOG=20] [C=8] [D ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ACCUM_TPU_UNROLL_CARRIES", "1")
os.environ.setdefault("ACCUM_TPU_MSM_ENGINE", "u32")

import numpy as np


def _sync(x):
    import jax
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def time_graph(fn, reps=3):
    out = fn()
    _sync(out)  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        _sync(fn())
    return (time.time() - t0) / reps


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
    from accumulation_tpu.jit import ipa_open_fused as fo
    from accumulation_tpu.ops import msm as msm_mod
    from accumulation_tpu.pc.pedersen import _sample_points

    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ds = [int(x) for x in sys.argv[3:]] or [2, 8, 32]
    n = 1 << n_log
    curve = PALLAS
    rng = np.random.default_rng(3)
    # engine/unroll config fingerprint: timings recorded under one config
    # must not be combined with another's (ADVICE r04)
    engine_cfg = "|".join([
        os.environ.get("ACCUM_TPU_MSM_ENGINE", ""),
        str(msm_mod.SWEEP_CHUNK), str(msm_mod.AGG_UNROLL_N),
        str(msm_mod.DBL_UNROLL_N),
        os.environ.get("ACCUM_TPU_UNROLL_CARRIES", ""),
    ])

    pts = _sample_points(curve, n, b"scaling|" + str(n).encode())
    scalars = fp.random_elements(curve.fr, rng, (n,))

    # Resume: a prior checkpoint (same n, c) carries its measured T_1 /
    # relay floor / completed D terms forward, so a re-run only compiles
    # the MISSING shard graphs — the T_1 graph alone is a ~35 min cold
    # compile on the remote helper and must not be repeated per attempt.
    ckpt = os.environ.get("SCALING_CKPT")
    prev = {}
    if ckpt and os.path.exists(ckpt):
        try:
            with open(ckpt) as f:
                prev = json.loads(f.read().strip() or "{}")
        except Exception:
            prev = {}
        if prev.get("n") != n or prev.get("c") != c \
                or prev.get("engine_cfg", engine_cfg) != engine_cfg:
            prev = {}
        elif prev:
            print(f"[scaling] resuming from {ckpt}: "
                  f"{sorted(k for k in prev if k.startswith('d'))}",
                  file=sys.stderr)

    # relay floor: the smallest readback's round-trip (bounds any wire term)
    tiny = jnp.zeros((4,), jnp.uint32)
    if "relay_floor_s" in prev:
        relay_floor = prev["relay_floor_s"]
    else:
        relay_floor = time_graph(lambda: tiny + 1, reps=5)

    # T_1: the shipped single-chip product path
    if "t1_s" in prev:
        t1 = prev["t1_s"]
        print(f"[scaling] T_1(n=2^{n_log}) = {t1*1e3:.0f} ms (checkpoint)",
              file=sys.stderr)
    else:
        t1 = time_graph(lambda: msm_mod.msm(curve, pts, scalars, c=c))
        print(f"[scaling] T_1(n=2^{n_log}) = {t1*1e3:.0f} ms",
              file=sys.stderr)

    out = {"metric": "msm_scaling_efficiency_model", "n": n, "c": c,
           "engine_cfg": engine_cfg,
           "t1_s": round(t1, 4), "relay_floor_s": round(relay_floor, 4)}
    out.update({k: v for k, v in prev.items() if k.startswith("d")})
    # a kill mid-compile (cold shard graphs are minutes each) must not
    # lose completed D terms: checkpoint the JSON line after every D

    def _checkpoint():
        if ckpt:
            with open(ckpt, "w") as f:
                f.write(json.dumps(out) + "\n")

    _checkpoint()
    for d in ds:
        if f"d{d}_efficiency" in out:
            print(f"[scaling] D={d}: checkpointed, skipping",
                  file=sys.stderr)
            continue
        n_loc = n // d
        pts_l = wst.Affine(pts.x[:n_loc], pts.y[:n_loc], pts.inf[:n_loc])
        sc_l = scalars[:n_loc]
        cl = msm_mod._pick_c(n_loc)
        s = fo._slot_bound(n_loc, cl)

        def shard():
            mag, signs, ranks, of, wm = msm_mod._signed_digits_and_ranks(
                curve, sc_l, cl)
            return fo._half_sweep(curve, cl, s, pts_l, mag, signs, ranks,
                                  of, wm)

        t_shard = time_graph(shard)

        # combine: tree-add of d gathered partials (batched group adds)
        ones = jnp.asarray(curve.fq.one_mont, fp.DTYPE)
        parts = wst.Projective(
            jnp.broadcast_to(pts.x[:d], (d,) + pts.x.shape[1:]),
            jnp.broadcast_to(pts.y[:d], (d,) + pts.y.shape[1:]),
            jnp.broadcast_to(ones, (d,) + pts.x.shape[1:]))
        t_comb = time_graph(lambda: wst._tree_reduce(curve, parts))

        td = t_shard + t_comb + relay_floor
        eff = t1 / (d * td)
        print(f"[scaling] D={d}: shard {t_shard*1e3:.0f} ms (c={cl}, s={s})"
              f" + combine {t_comb*1e3:.0f} ms -> eff {eff:.2%}",
              file=sys.stderr)
        out[f"d{d}_shard_s"] = round(t_shard, 4)
        out[f"d{d}_combine_s"] = round(t_comb, 4)
        out[f"d{d}_efficiency"] = round(eff, 4)
        _checkpoint()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
