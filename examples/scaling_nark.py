"""NARK scaling benchmark.

Port of /root/reference/examples/scaling-nark.rs:58-110: NARK index / prove /
verify wall clock vs 2^k constraints, zk and non-zk.

Usage: python examples/scaling_nark.py <log_min> <log_max> [--zk]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_min", type=int)
    ap.add_argument("log_max", type=int)
    ap.add_argument("--zk", action="store_true")
    args = ap.parse_args()

    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.schemes.r1cs_nark import R1CSNark
    from test_r1cs_nark import DummyCircuit

    curve = PALLAS
    nark = R1CSNark(curve)
    rng = np.random.default_rng(0)
    p = curve.fr.modulus

    for k in range(args.log_min, args.log_max + 1):
        nc = 1 << k
        print(f"Constraints: {nc}")
        t0 = time.time()
        ipk, ivk = nark.index(DummyCircuit(
            num_variables=nc, num_constraints=nc))
        print(f"Indexer: {(time.time()-t0)*1e3:.0f} ms")

        a = int.from_bytes(rng.bytes(40), "little") % p
        b = int.from_bytes(rng.bytes(40), "little") % p
        circuit = DummyCircuit(a, b, nc, nc)
        # warm pass: each constraint count is a fresh shape set, and the
        # first trace compiles — recorded numbers are warm (algorithm
        # throughput, not XLA compile time)
        proof = nark.prove(ipk, circuit, make_zk=args.zk, rng=rng)
        nark.verify(ivk, [1, a * b % p], proof)
        t0 = time.time()
        proof = nark.prove(ipk, circuit, make_zk=args.zk, rng=rng)
        prove_s = time.time() - t0
        print(f"Prover: {prove_s*1e3:.0f} ms "
              f"({prove_s/nc*1e9:.0f} ns/constraint)")
        t0 = time.time()
        ok = nark.verify(ivk, [1, a * b % p], proof)
        print(f"Verifier: {(time.time()-t0)*1e3:.0f} ms")
        assert ok
        print()


if __name__ == "__main__":
    main()
