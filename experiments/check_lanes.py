"""Cross-check the selected MSM engine against a python-int ground truth.

Run with the engine under test selected via env, e.g.:
    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= ACCUM_TPU_MSM_ENGINE=lanes \
        python experiments/check_lanes.py 256
Only ONE engine compiles per process (ground truth is host bigint
double-and-add), which avoids the XLA:CPU compile starvation that blocked
the two-engine comparison runs (CLAUDE.md round-2 handoff).

The lane-major engine was retired from the product dispatch (see
ops/msm.py) — selecting ACCUM_TPU_MSM_ENGINE=lanes here patches the
retired experiments/msm_lanes.py engine into the bucket phase so the
cross-check remains reproducible."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def py_add(P, a, b):
    if a is None:
        return b
    if b is None:
        return a
    (x1, y1), (x2, y2) = a, b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def py_mul(P, pt, k):
    acc = None
    for i in range(k.bit_length() - 1, -1, -1):
        acc = py_add(P, acc, acc)
        if (k >> i) & 1:
            acc = py_add(P, acc, pt)
    return acc


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from accumulation_tpu.curves import PALLAS, weierstrass as wst
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import msm as msm_mod
    from accumulation_tpu.pc.pedersen import _sample_points

    if os.environ.get("ACCUM_TPU_MSM_ENGINE") == "lanes":
        import msm_lanes as _lanes

        def _lane_bucket(curve, points, mag, pr, c, s, signs=None,
                         signed=False, overflow=None, dbl_counts=None):
            return _lanes.bucket_phase_lanes(
                curve, points, mag, pr, c, s, signs=signs, signed=signed,
                overflow=overflow, dbl_counts=dbl_counts)

        msm_mod._bucket_phase = _lane_bucket

    C = PALLAS
    P = C.fq.modulus
    print(f"engine={msm_mod._MSM_ENGINE} n={n} "
          f"platform={os.environ.get('JAX_PLATFORMS', '<default>')}",
          flush=True)

    rng = np.random.default_rng(7)
    pts = _sample_points(C, n, b"lane-check")
    sc = fp.random_elements(C.fr, rng, (n,))
    # force a zero scalar + a duplicated digit pattern into the batch
    sc = sc.at[1].set(0)
    sc = sc.at[2].set(sc[3])

    pt_ints = wst.affine_to_ints(C, pts)
    sc_ints = fp.array_to_ints(C.fr, sc)
    t0 = time.time()
    want = None
    for p_i, k_i in zip(pt_ints, sc_ints):
        want = py_add(P, want, py_mul(P, p_i, k_i))
    print(f"ground truth: {time.time() - t0:.1f}s", flush=True)

    ok = True
    for c in (4, 8):
        t0 = time.time()
        got = wst.affine_to_ints(
            C, wst.to_affine(C, msm_mod.msm(C, pts, sc, c=c)))[0]
        match = got == want
        ok &= match
        print(f"msm c={c}: {'OK' if match else 'MISMATCH'} "
              f"({time.time() - t0:.1f}s)", flush=True)
        if not match:
            print(f"  got  {got}\n  want {want}", flush=True)

    # batched path (shares the bucket kernel via vmapped digits)
    scb = fp.random_elements(C.fr, rng, (2, n))
    t0 = time.time()
    gotb = wst.to_affine(C, msm_mod.msm_batched(C, pts, scb))
    gots = wst.affine_to_ints(C, gotb)
    scb_ints = [fp.array_to_ints(C.fr, scb[i]) for i in range(2)]
    for i in range(2):
        wantb = None
        for p_i, k_i in zip(pt_ints, scb_ints[i]):
            wantb = py_add(P, wantb, py_mul(P, p_i, k_i))
        match = gots[i] == wantb
        ok &= match
        print(f"msm_batched[{i}]: {'OK' if match else 'MISMATCH'}", flush=True)
    print(f"batched: {time.time() - t0:.1f}s", flush=True)

    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
