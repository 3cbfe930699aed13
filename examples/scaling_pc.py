"""Raw polynomial-commitment scaling benchmark.

Port of /root/reference/examples/scaling-pc.rs:32-102: trim / commit / open /
check wall clock for TrivialPC and IpaPC vs degree 2^k - 1.

Usage: python examples/scaling_pc.py <log_min> <log_max> [--scheme trivial|ipa]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_min", type=int)
    ap.add_argument("log_max", type=int)
    ap.add_argument("--scheme", choices=["trivial", "ipa"], default="ipa")
    args = ap.parse_args()

    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc, trivial_pc

    curve = PALLAS
    rng = np.random.default_rng(0)

    for k in range(args.log_min, args.log_max + 1):
        degree = (1 << k) - 1
        print(f"Degree: {degree}")
        if args.scheme == "ipa":
            pp = ipa_pc.setup(curve, degree)
            t0 = time.time()
            ck = ipa_pc.trim(pp, degree)
            print(f"Trim: {(time.time()-t0)*1e3:.0f} ms")
            coeffs = fp.random_elements(curve.fr, rng, (degree + 1,))
            point = fp.random_elements(curve.fr, rng, ())
            t0 = time.time()
            comm = ipa_pc.commit(curve, ck, coeffs)
            comm.x.block_until_ready()
            print(f"Commit: {(time.time()-t0)*1e3:.0f} ms")
            t0 = time.time()
            proof = ipa_pc.open(curve, ck, coeffs, comm, point)
            print(f"Open: {(time.time()-t0)*1e3:.0f} ms")
            value = poly_ops.evaluate(curve.fr, coeffs, point)
            t0 = time.time()
            ok = ipa_pc.check(curve, ck, comm, point, value, proof)
            print(f"Check: {(time.time()-t0)*1e3:.0f} ms")
            assert ok
        else:
            pp = trivial_pc.setup(curve, degree)
            t0 = time.time()
            ck = trivial_pc.trim(pp, degree)
            print(f"Trim: {(time.time()-t0)*1e3:.0f} ms")
            coeffs = fp.random_elements(curve.fr, rng, (degree + 1,))
            point = fp.random_elements(curve.fr, rng, ())
            t0 = time.time()
            comm = trivial_pc.commit(curve, ck, coeffs)
            comm.x.block_until_ready()
            print(f"Commit: {(time.time()-t0)*1e3:.0f} ms")
            value = poly_ops.evaluate(curve.fr, coeffs, point)
            t0 = time.time()
            ok = trivial_pc.check(curve, ck, comm, point, value, coeffs)
            print(f"Check: {(time.time()-t0)*1e3:.0f} ms")
            assert ok
        print()


if __name__ == "__main__":
    main()
