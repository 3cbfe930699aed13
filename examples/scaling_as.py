"""Accumulation-scheme scaling benchmark.

Port of the reference harness /root/reference/examples/scaling-as.rs:62-137:
for each degree 2^k - 1, k in [log_min, log_max], measure AS index / prove /
verify / decide wall clock and serialized accumulator sizes, for
trivial-pc-as and ipa-pc-as.  The prove step uses one fresh input plus two
copies of a previous accumulator (scaling-as.rs:79-102).

Usage: python examples/scaling_as.py <log_min_degree> <log_max_degree>
       [--scheme trivial|ipa|hp] [--zk]

--scheme hp extends the same pattern to hp_as at Hadamard vector length
2^k (BASELINE config row; the reference harness covers trivial/ipa only).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def profile_trivial(degree, rng, make_zk):
    from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK
    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import trivial_pc
    from accumulation_tpu.schemes.trivial_pc_as import (ASForTrivialPC,
                                                        InputInstance)
    from accumulation_tpu.utils import serialize

    curve = PALLAS
    scheme = ASForTrivialPC(curve)
    pp = trivial_pc.setup(curve, degree)

    t0 = time.time()
    keys = scheme.index(None, pp, degree)
    index_ms = (time.time() - t0) * 1e3

    def gen_input():
        coeffs = fp.random_elements(curve.fr, rng, (degree + 1,))
        point = fp.random_elements(curve.fr, rng, ())
        value = poly_ops.evaluate(curve.fr, coeffs, point)
        comm = trivial_pc.commit(curve, keys[0], coeffs)
        return InstanceWitnessPair(
            InputInstance(comm, point, value), coeffs)

    inputs = [gen_input()]
    acc, _ = scheme.prove(keys[0], inputs, [], MakeZK.Disabled())
    old = [acc, acc]

    # warm pass at the TIMED shapes (1 input + 2 old accumulators): the
    # first trace of a new shape set compiles; recorded numbers are warm
    acc2, proof = scheme.prove(keys[0], inputs, old, MakeZK.Disabled())
    scheme.verify(keys[1], [i.instance for i in inputs],
                  [a.instance for a in old], acc2.instance, proof)
    scheme.decide(keys[2], acc2)

    t0 = time.time()
    acc2, proof = scheme.prove(keys[0], inputs, old, MakeZK.Disabled())
    prove_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    ok_v = scheme.verify(keys[1], [i.instance for i in inputs],
                         [a.instance for a in old], acc2.instance, proof)
    verify_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    ok_d = scheme.decide(keys[2], acc2)
    decide_ms = (time.time() - t0) * 1e3
    assert ok_v and ok_d
    return dict(index=index_ms, prove=prove_ms, verify=verify_ms,
                decide=decide_ms, acc_bytes=None)


def profile_ipa(degree, rng, make_zk):
    from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK
    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.schemes.ipa_pc_as import (
        AtomicASForInnerProductArgPC, InputInstance, PredicateIndex)
    from accumulation_tpu.utils import serialize

    curve = PALLAS
    scheme = AtomicASForInnerProductArgPC(curve)
    pp = ipa_pc.setup(curve, degree)

    t0 = time.time()
    keys = scheme.index(None, pp, PredicateIndex(degree, degree))
    index_ms = (time.time() - t0) * 1e3
    ck = keys[0].ipa_ck

    def gen_input():
        coeffs = fp.random_elements(curve.fr, rng, (degree + 1,))
        point = fp.random_elements(curve.fr, rng, ())
        value = poly_ops.evaluate(curve.fr, coeffs, point)
        if make_zk:
            omega = fp.random_elements(curve.fr, rng, ())
            comm = ipa_pc.commit(curve, ck, coeffs, omega)
            proof = ipa_pc.open(curve, ck, coeffs, comm, point, rand=omega,
                                hiding=True, rng=rng)
        else:
            comm = ipa_pc.commit(curve, ck, coeffs)
            proof = ipa_pc.open(curve, ck, coeffs, comm, point)
        return InstanceWitnessPair(InputInstance(comm, point, value, proof), None)

    mk = (lambda: MakeZK.Enabled(rng)) if make_zk else MakeZK.Disabled
    inputs = [gen_input()]
    acc, _ = scheme.prove(keys[0], inputs, [], mk())
    old = [acc, acc]

    # warm pass at the TIMED shapes (1 input + 2 old accumulators): the
    # first trace of a new shape set compiles; recorded numbers are warm
    acc2, proof = scheme.prove(keys[0], inputs, old, mk())
    scheme.verify(keys[1], [i.instance for i in inputs],
                  [a.instance for a in old], acc2.instance, proof)
    scheme.decide(keys[2], acc2)

    t0 = time.time()
    acc2, proof = scheme.prove(keys[0], inputs, old, mk())
    prove_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    ok_v = scheme.verify(keys[1], [i.instance for i in inputs],
                         [a.instance for a in old], acc2.instance, proof)
    verify_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    ok_d = scheme.decide(keys[2], acc2)
    decide_ms = (time.time() - t0) * 1e3
    assert ok_v and ok_d
    acc_bytes = len(serialize.serialize_ipa_accumulator(curve, acc2))
    return dict(index=index_ms, prove=prove_ms, verify=verify_ms,
                decide=decide_ms, acc_bytes=acc_bytes)


def profile_hp(vec_len, rng, make_zk):
    """hp_as at Hadamard vector length 2^k (BASELINE config: len 2^14).

    The reference's scaling-as.rs covers trivial/ipa only; this extends the
    same one-fresh-input + two-old-accumulators pattern to hp_as so the
    BASELINE hp row has a recorded number."""
    from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK
    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.fields import fp
    from accumulation_tpu.pc import pedersen
    from accumulation_tpu.schemes.hp_as import (ASForHadamardProducts,
                                                InputInstance, InputWitness)
    from accumulation_tpu.utils import serialize

    curve = PALLAS
    scheme = ASForHadamardProducts(curve)
    t0 = time.time()
    keys = scheme.index(None, None, vec_len)
    index_ms = (time.time() - t0) * 1e3
    pk = keys[0]

    def gen_input():
        a = fp.random_elements(curve.fr, rng, (vec_len,))
        b = fp.random_elements(curve.fr, rng, (vec_len,))
        prod = fp.mul(curve.fr, a, b)
        inst = InputInstance(pedersen.commit(curve, pk, a),
                             pedersen.commit(curve, pk, b),
                             pedersen.commit(curve, pk, prod))
        return InstanceWitnessPair(inst, InputWitness(a, b, None))

    mk = (lambda: MakeZK.Enabled(rng)) if make_zk else MakeZK.Disabled
    inputs = [gen_input()]
    acc, _ = scheme.prove(keys[0], inputs, [], mk())
    old = [acc, acc]

    # warm pass at the TIMED shapes (1 input + 2 old accumulators): the
    # first trace of a new shape set compiles; recorded numbers are warm
    acc2, proof = scheme.prove(keys[0], inputs, old, mk())
    scheme.verify(keys[1], [i.instance for i in inputs],
                  [a.instance for a in old], acc2.instance, proof)
    scheme.decide(keys[2], acc2)

    t0 = time.time()
    acc2, proof = scheme.prove(keys[0], inputs, old, mk())
    prove_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    ok_v = scheme.verify(keys[1], [i.instance for i in inputs],
                         [a.instance for a in old], acc2.instance, proof)
    verify_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    ok_d = scheme.decide(keys[2], acc2)
    decide_ms = (time.time() - t0) * 1e3
    assert ok_v and ok_d
    acc_bytes = len(serialize.serialize_hp_accumulator(curve, acc2))
    return dict(index=index_ms, prove=prove_ms, verify=verify_ms,
                decide=decide_ms, acc_bytes=acc_bytes)


PROFILES = {"trivial": profile_trivial, "ipa": profile_ipa, "hp": profile_hp}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_min", type=int)
    ap.add_argument("log_max", type=int)
    ap.add_argument("--scheme", choices=sorted(PROFILES), default="trivial")
    ap.add_argument("--zk", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for k in range(args.log_min, args.log_max + 1):
        # hp_as scales in vector LENGTH 2^k; the PC schemes in degree 2^k-1
        degree = (1 << k) if args.scheme == "hp" else (1 << k) - 1
        print(f"{'Vector length' if args.scheme == 'hp' else 'Degree'}: "
              f"{degree}")
        fn = PROFILES[args.scheme]
        r = fn(degree, rng, args.zk)
        print(f"Indexer: {r['index']:.0f} ms")
        print(f"Prover: {r['prove']:.0f} ms")
        print(f"Verifier: {r['verify']:.0f} ms")
        print(f"Decider: {r['decide']:.0f} ms")
        if r["acc_bytes"]:
            print(f"Accumulator size: {r['acc_bytes']} bytes")
        print()


if __name__ == "__main__":
    main()
