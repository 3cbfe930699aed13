"""One PCD recursion step, end to end — the composition the reference's
constraints/ layer exists for (SURVEY.md §3.5):

  1. accumulate Hadamard-product claims over PALLAS (ASForHadamardProducts);
  2. re-express the accumulation VERIFIER as an R1CS over Fq
     (ASForHPVerifierGadget) — Fq is exactly VESTA's scalar field;
  3. prove that circuit with the R1CS NARK over VESTA, and verify the NARK
     proof against the accumulator instance as public input.

i.e. "a succinct proof that the accumulation step was verified" — the
building block BCLMS20 chains into proof-carrying data across the Pasta
cycle.

Usage: python examples/pcd_step.py [--num-inputs 1] [--vec-len 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


class HpVerifierCircuit:
    """Synthesizes the hp_as verifier gadget into a provided constraint
    system (the NARK's ConstraintSynthesizer role)."""

    def __init__(self, curve, vk, input_instances, acc_instance, proof):
        self.curve = curve
        self.vk = vk
        self.input_instances = input_instances
        self.acc_instance = acc_instance
        self.proof = proof

    def generate_constraints(self, cs):
        from accumulation_tpu.constraints import hp_as_gadget
        from accumulation_tpu.constraints.gadgets import GadgetCS
        g = GadgetCS(self.curve.fq, cs)
        inputs = [hp_as_gadget.HpInstanceVar(g, self.curve, i)
                  for i in self.input_instances]
        new = hp_as_gadget.HpInstanceVar(g, self.curve, self.acc_instance,
                                         public=True)
        pvar = hp_as_gadget.HpProofVar(g, self.curve, self.proof)
        hp_as_gadget.ASForHPVerifierGadget(self.curve).verify(
            g, self.vk, inputs, [], new, pvar)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-inputs", type=int, default=1)
    ap.add_argument("--vec-len", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp
    from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK
    from accumulation_tpu.curves import PALLAS, VESTA
    from accumulation_tpu.fields import fp
    from accumulation_tpu.pc import pedersen
    from accumulation_tpu.schemes import common as scommon, hp_as
    from accumulation_tpu.schemes.r1cs_nark import R1CSNark

    rng = np.random.default_rng(0)
    curve = PALLAS
    t0 = time.time()

    # 1. native accumulation over Pallas
    scheme = hp_as.ASForHadamardProducts(curve)
    pk, vk, dk = scheme.index(None, None, args.vec_len)
    pairs = []
    for _ in range(args.num_inputs):
        a = fp.random_elements(curve.fr, rng, (args.vec_len,))
        b = fp.random_elements(curve.fr, rng, (args.vec_len,))
        prod = hp_as.compute_hp(curve, a, b)
        comms = pedersen.commit_batched(curve, pk, jnp.stack([a, b, prod]))
        cl = scommon.unstack_affine(comms)
        pairs.append(InstanceWitnessPair(
            hp_as.InputInstance(cl[0], cl[1], cl[2]),
            hp_as.InputWitness(a, b, None)))
    acc, proof = scheme.prove(pk, pairs, [], MakeZK.Disabled())
    assert scheme.verify(vk, [p.instance for p in pairs], [], acc.instance,
                         proof)
    print(f"[{time.time()-t0:6.1f}s] accumulated {args.num_inputs} claims "
          f"over {curve.name}")

    # 2+3. NARK over Vesta proves the in-circuit verification
    circuit = HpVerifierCircuit(
        curve, vk, [p.instance for p in pairs], acc.instance, proof)
    nark = R1CSNark(VESTA)
    ipk, ivk = nark.index(circuit)
    print(f"[{time.time()-t0:6.1f}s] verifier circuit: "
          f"{ipk.index_info.num_constraints} constraints, "
          f"{ipk.index_info.num_instance_variables} public inputs")
    nark_proof = nark.prove(ipk, circuit)
    print(f"[{time.time()-t0:6.1f}s] NARK proof over {VESTA.name} produced")

    # the public input is the accumulator instance (as allocated field elems)
    from accumulation_tpu.constraints.r1cs import ConstraintSystem, PROVE
    cs = ConstraintSystem(VESTA.fr, PROVE)
    circuit.generate_constraints(cs)
    public_input = cs.instance_assignment
    ok = nark.verify(ivk, public_input, nark_proof)
    print(f"[{time.time()-t0:6.1f}s] NARK verify: {ok}")
    assert ok
    # decider still certifies the accumulated claims natively
    assert scheme.decide(dk, acc)
    print(f"[{time.time()-t0:6.1f}s] decider OK — PCD step complete")


if __name__ == "__main__":
    main()
