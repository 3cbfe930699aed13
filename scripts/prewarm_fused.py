"""Pre-warm the fused IPA open's compile cache for a given key length.

The fused open (jit/ipa_open_fused.py) needs one remote compile per big
folding round plus one for the fused tail and one for the prologue — at
n = 2^20 that is ~10 graphs at 40-400 s each on a cold axon cache (the
compiles are remote; CLAUDE.md).  The persistent XLA cache is shared across
processes, so compiling the graphs from PARALLEL subprocesses overlaps the
remote compile latency: wall-clock drops from sum(compiles) toward
max(compiles) when the remote service admits concurrent requests.

Usage:
    python scripts/prewarm_fused.py [--log-n 20] [--jobs 6]
    python scripts/prewarm_fused.py --one prologue:N
    python scripts/prewarm_fused.py --one round:L,CWIN,S
    python scripts/prewarm_fused.py --one tail:N

Values are dummies (zero field elements / identity points): the XLA cache
keys on the compiled graph, not the data, so a later real `open_fused` at
the same n hits the warm cache.
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ACCUM_TPU_UNROLL_CARRIES", "1")
os.environ.setdefault("ACCUM_TPU_MSM_ENGINE", "u32")


def _compile_one(spec: str):
    import jax.numpy as jnp
    import numpy as np

    from accumulation_tpu.curves import PALLAS, weierstrass as wst
    from accumulation_tpu.fields.fp import DTYPE, NLIMBS
    from accumulation_tpu.jit import ipa_open_fused as fo
    from accumulation_tpu.ops import poseidon

    curve = PALLAS
    fq, fr = curve.fq, curve.fr
    kind, _, arg = spec.partition(":")
    state = jnp.zeros((poseidon.T, fq.nlimbs), DTYPE)

    def dummy(L):
        a = jnp.zeros((L, NLIMBS), DTYPE)
        g = wst.affine_zero(curve, (L,))
        return a, g

    u = wst.projective_zero(curve, ())
    t0 = time.time()
    if kind == "prologue":
        # pm is a STATIC arg of _prologue — it must match the (mode, pos)
        # the real open_fused passes, i.e. the host sponge state right
        # after the IPA_PC domain absorb
        from accumulation_tpu.fields import fp as fp_mod
        from accumulation_tpu.ops.sponge import IPA_PC_DOMAIN, domain_sponge
        hsp = domain_sponge(fq, IPA_PC_DOMAIN)
        state = fp_mod.array_from_ints(fq, hsp.state)
        pm = (hsp.mode, hsp.pos)
        n = int(arg)
        a, _ = dummy(n)
        comm = wst.affine_zero(curve, ())
        point = jnp.zeros((NLIMBS,), DTYPE)
        out = fo._prologue(curve, n, False, pm, state, a, comm,
                           point, point)
    elif kind == "rmsm":
        # compiles BOTH graphs of the round's msm half (digits + sweep)
        L, cwin, s = (int(x) for x in arg.split(","))
        a, g = dummy(L)
        out = fo._round_msms(curve, cwin, s, None, a, g)
    elif kind == "rfold":
        L = int(arg)
        a, g = dummy(L)
        m2 = wst.projective_zero(curve, (2,))
        out = fo._round_fold(curve, ("squeeze", 1), state, a, a, g, u, m2)
    elif kind == "tail":
        # tail:N[,GI] — compile tail group GI (default: all groups in
        # sequence; a group's outputs feed the next group's input shapes)
        parts = [int(x) for x in arg.split(",")]
        n, gi = parts[0], (parts[1] if len(parts) > 1 else None)
        _, tail = fo.round_plan(n)
        if not tail:
            return
        groups = [tail[i:i + fo.TAIL_GROUP]
                  for i in range(0, len(tail), fo.TAIL_GROUP)]
        if gi is not None:
            groups = [groups[gi]]
        out = None
        for grp in groups:
            a, g = dummy(grp[0][0])
            out = fo._tail_group(curve, grp, ("squeeze", 1), None,
                                 state, a, a, g, u)
    else:
        raise SystemExit(f"unknown graph spec {spec!r}")
    # small readback = the only reliable completion barrier on axon
    import jax
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"[prewarm] {spec}: compiled+ran in {time.time() - t0:.1f}s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--jobs", type=int, default=6)
    ap.add_argument("--one", help="compile a single graph spec (child mode)")
    ap.add_argument("--retries", type=int, default=2,
                    help="re-queue a failed graph up to N times (the remote "
                         "TPU worker crashes stochastically on the biggest "
                         "round graphs — r03 prewarm logs)")
    args = ap.parse_args()

    if args.one:
        _compile_one(args.one)
        return

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sentinel = os.path.join(root, "experiments", "SKIP_PREWARM")
    if os.path.exists(sentinel):
        # a queued prewarm must not overlap the driver's end-of-round
        # bench (two TPU processes wedge the relay — CLAUDE.md)
        print("[prewarm] skipped: sentinel present", flush=True)
        return

    from accumulation_tpu.jit import ipa_open_fused as fo

    n = 1 << args.log_n
    big, tail = fo.round_plan(n)
    # rounds sharing a pivot share one graph set — dedup on (Lp, c, s);
    # ordered so an interrupted prewarm leaves a USABLE prefix: prologue,
    # the largest pivot's graphs, the tail (any open needs it), then the
    # smaller pivots (each one warm lets ACCUM_TPU_FUSED_PIVOTS drop it in)
    sets = list(dict.fromkeys((Lp, c, s) for (_L, Lp, c, s) in big))
    n_groups = (len(tail) + fo.TAIL_GROUP - 1) // fo.TAIL_GROUP
    tail_specs = [f"tail:{n},{gi}" for gi in range(n_groups)]
    specs = [f"prologue:{n}"]
    for i, (Lp, c, s) in enumerate(sets):
        specs += [f"rmsm:{Lp},{c},{s}", f"rfold:{Lp}"]
        if i == 0:
            specs += tail_specs
    if not sets:
        specs += tail_specs
    print(f"[prewarm] {len(specs)} graphs for n=2^{args.log_n}, "
          f"{args.jobs} parallel jobs", flush=True)

    t0 = time.time()
    pending = list(specs)
    running = {}
    attempts = {spec: 0 for spec in specs}
    failed = []
    while pending or running:
        while pending and len(running) < args.jobs:
            spec = pending.pop(0)
            attempts[spec] += 1
            p = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--one", spec])
            running[p.pid] = (p, spec)
        done = [pid for pid, (p, _) in running.items() if p.poll() is not None]
        for pid in done:
            p, spec = running.pop(pid)
            if p.returncode != 0:
                if attempts[spec] <= args.retries:
                    print(f"[prewarm] retrying {spec} (rc={p.returncode}, "
                          f"attempt {attempts[spec]}/{args.retries + 1})",
                          flush=True)
                    pending.append(spec)  # back of the queue: let the
                    # remote worker recover before re-submitting
                else:
                    failed.append(spec)
                    print(f"[prewarm] FAILED: {spec} (rc={p.returncode}, "
                          f"gave up after {attempts[spec]} attempts)",
                          flush=True)
        time.sleep(2)
    print(f"[prewarm] done in {time.time() - t0:.0f}s; "
          f"{len(failed)} failures: {failed}", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
