"""Deep accumulation chain (the scaling-as chain pattern, BASELINE.md's
1024-step config): accumulate a long stream of IPA-PC opening claims one at a
time, carrying the single accumulator forward; decide once at the end.

Demonstrates the checkpoint/resume story: the accumulator is serialized and
re-loaded mid-chain (utils/serialize.py) — an accumulation chain's checkpoint
IS its accumulator (SURVEY.md §5).

Usage: python examples/deep_chain.py [--steps 32] [--degree 15]
       [--checkpoint-every 8] [--mesh DCN,ICI]

--mesh runs the whole chain under a hierarchical ("dcn","ici") device grid
(parallel/multihost.py): every fold-round MSM big enough to shard runs
through shard_map over the mesh — the BASELINE "1024-step chain on a
multi-host mesh" configuration.  On the CPU test backend use
XLA_FLAGS=--xla_force_host_platform_device_count=8 for 8 virtual devices.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--degree", type=int, default=15)
    ap.add_argument("--checkpoint-every", type=int, default=8)
    ap.add_argument("--mesh", default=None, metavar="DCN,ICI",
                    help='hierarchical grid shape, e.g. "2,4"')
    args = ap.parse_args()

    from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK
    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.schemes.ipa_pc_as import (
        AtomicASForInnerProductArgPC, InputInstance, PredicateIndex)
    from accumulation_tpu.utils import serialize

    curve = PALLAS
    rng = np.random.default_rng(0)
    scheme = AtomicASForInnerProductArgPC(curve)
    pp = ipa_pc.setup(curve, args.degree)
    pk, vk, dk = scheme.index(None, pp, PredicateIndex(args.degree, args.degree))
    ck = pk.ipa_ck

    def fresh_input():
        coeffs = fp.random_elements(curve.fr, rng, (args.degree + 1,))
        point = fp.random_elements(curve.fr, rng, ())
        value = poly_ops.evaluate(curve.fr, coeffs, point)
        comm = ipa_pc.commit(curve, ck, coeffs)
        proof = ipa_pc.open(curve, ck, coeffs, comm, point)
        return InstanceWitnessPair(InputInstance(comm, point, value, proof), None)

    import contextlib
    mesh_ctx = contextlib.nullcontext()
    if args.mesh:
        from accumulation_tpu.parallel import context, multihost
        d_dcn, d_ici = (int(x) for x in args.mesh.split(","))
        mesh_ctx = context.use_mesh(multihost.make_mesh_2d(d_dcn, d_ici))
        print(f"chain under ({d_dcn},{d_ici}) hierarchical mesh")

    acc = None
    t0 = time.time()
    with mesh_ctx:
        for step in range(args.steps):
            inputs = [fresh_input()]
            old = [acc] if acc is not None else []
            acc, proof = scheme.prove(pk, inputs, old, MakeZK.Disabled())
            ok = scheme.verify(vk, [i.instance for i in inputs],
                               [a.instance for a in old], acc.instance, proof)
            assert ok, f"verify failed at step {step}"
            if (step + 1) % args.checkpoint_every == 0:
                blob = serialize.serialize_ipa_accumulator(curve, acc)
                acc = serialize.deserialize_ipa_accumulator(curve, blob)
                print(f"step {step + 1}: checkpointed accumulator "
                      f"({len(blob)} bytes), resumed from bytes", flush=True)
    # the final decide is a one-off check — single-device is fine
    assert scheme.decide(dk, acc), "final decide failed"
    dt = time.time() - t0
    print(f"{args.steps}-step chain complete: {dt:.1f}s "
          f"({dt / args.steps * 1e3:.0f} ms/step), decide OK")


if __name__ == "__main__":
    main()
