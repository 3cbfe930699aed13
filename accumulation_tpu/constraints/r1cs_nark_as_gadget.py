"""ASForR1CSNarkVerifierGadget: the NARK accumulation verifier in-circuit.

TPU-native counterpart of the reference gadget
(/root/reference/src/r1cs_nark_as/constraints/mod.rs): per-zk-input gamma
re-derivation (mod.rs:94-117), blinded first-round commitments
(mod.rs:174-233), HP input instances (mod.rs:240-265), composition with
`ASForHPVerifierGadget.verify` under the forked hp sponge (mod.rs:487-495),
beta challenges (mod.rs:131-167), and the combined-instance equality checks
(mod.rs:269-291, 523-537).  The beta-weighted r1cs_input fold uses the
emulated-limb relation gadget (the reference's `mul_without_reduce` lazy
reduction analog).
"""

from __future__ import annotations

from typing import List, Optional

from ..curves.weierstrass import CurveSpec
from ..fields import fp
from ..ops.sponge import (AS_FOR_HP_DOMAIN, AS_FOR_R1CS_NARK_DOMAIN,
                          R1CS_NARK_DOMAIN)
from ..schemes import common as scommon
from ..schemes import r1cs_nark_as
from . import nonnative as nn
from .gadgets import (BoolVar, FpVar, GadgetCS, PointVar, SpongeGadget,
                      point_add, point_enforce_equal, scalar_mul_le)
from .hp_as_gadget import (ASForHPVerifierGadget, HpInstanceVar, HpProofVar,
                           _absorb_point, _alloc_point)
from .trivial_pc_as_gadget import emulated_to_bits

CHALLENGE_SIZE = r1cs_nark_as.CHALLENGE_SIZE


def _domain_sponge(g: GadgetCS, domain: bytes) -> SpongeGadget:
    s = SpongeGadget(g)
    s.absorb_constant_bytes(domain)
    return s


def _absorb_scalar_stream(sponge: SpongeGadget, g: GadgetCS,
                          bit_lists: List[List[BoolVar]]):
    """Concatenated 32-byte scalars absorbed as ONE byte stream (31-byte
    chunks spanning element boundaries) — the NARK challenge input encoding
    (reference r1cs_nark/mod.rs:57-62)."""
    all_bits: List[BoolVar] = []
    for bits in bit_lists:
        padded = list(bits) + [None] * (256 - len(bits))
        all_bits.extend(padded)
    chunks = []
    for start in range(0, len(all_bits), 248):
        acc = FpVar.constant(g, 0)
        for i in range(start, min(start + 248, len(all_bits))):
            if all_bits[i] is not None:
                acc = acc + all_bits[i].var.scale(1 << (i - start))
        chunks.append(acc)
    if not chunks:
        chunks = [FpVar.constant(g, 0)]
    sponge.absorb(chunks)


def _absorb_scalars_individually(sponge: SpongeGadget, g: GadgetCS,
                                 bit_lists: List[List[BoolVar]]):
    """Each scalar absorbed as its own 32-byte string (2 chunks) — the
    instance-absorb encoding (host sponge absorb_scalar per element)."""
    for bits in bit_lists:
        lo = FpVar.constant(g, 0)
        hi = FpVar.constant(g, 0)
        for i, b in enumerate(bits):
            if i < 248:
                lo = lo + b.var.scale(1 << i)
            else:
                hi = hi + b.var.scale(1 << (i - 248))
        sponge.absorb([lo, hi])


class FirstRoundMessageVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec, msg):
        self.comm_a = _alloc_point(g, curve, scommon.affine_ints(curve, msg.comm_a))
        self.comm_b = _alloc_point(g, curve, scommon.affine_ints(curve, msg.comm_b))
        self.comm_c = _alloc_point(g, curve, scommon.affine_ints(curve, msg.comm_c))
        self.randomness = None
        if msg.randomness is not None:
            r = msg.randomness
            self.randomness = [
                _alloc_point(g, curve, scommon.affine_ints(curve, c))
                for c in (r.comm_r_a, r.comm_r_b, r.comm_r_c, r.comm_1, r.comm_2)]

    def absorb_into(self, sponge: SpongeGadget, g: GadgetCS):
        for c in (self.comm_a, self.comm_b, self.comm_c):
            _absorb_point(sponge, g, c)
        if self.randomness is not None:
            for c in self.randomness:
                _absorb_point(sponge, g, c)


class NarkInputInstanceVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec,
                 instance: r1cs_nark_as.InputInstance):
        r = curve.fr.modulus
        ints = fp.array_to_ints(curve.fr, instance.r1cs_input)
        self.r1cs_input = [nn.EmulatedVar.alloc(g, r, x) for x in ints]
        self.r1cs_input_bits = [emulated_to_bits(g, v, 256)
                                for v in self.r1cs_input]
        self.first_round_message = FirstRoundMessageVar(
            g, curve, instance.first_round_message)

    def absorb_into(self, sponge: SpongeGadget, g: GadgetCS):
        _absorb_scalars_individually(sponge, g, self.r1cs_input_bits)
        self.first_round_message.absorb_into(sponge, g)


class NarkAccInstanceVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec,
                 instance: r1cs_nark_as.AccumulatorInstance, public=False):
        r = curve.fr.modulus
        ints = fp.array_to_ints(curve.fr, instance.r1cs_input)
        self.r1cs_input = [nn.EmulatedVar.alloc(g, r, x, public) for x in ints]
        self.r1cs_input_bits = [emulated_to_bits(g, v, 256)
                                for v in self.r1cs_input]
        self.comm_a = _alloc_point(
            g, curve, scommon.affine_ints(curve, instance.comm_a), public)
        self.comm_b = _alloc_point(
            g, curve, scommon.affine_ints(curve, instance.comm_b), public)
        self.comm_c = _alloc_point(
            g, curve, scommon.affine_ints(curve, instance.comm_c), public)
        self.hp_instance = HpInstanceVar(g, curve, instance.hp_instance, public)

    def absorb_into(self, sponge: SpongeGadget, g: GadgetCS):
        _absorb_scalars_individually(sponge, g, self.r1cs_input_bits)
        for c in (self.comm_a, self.comm_b, self.comm_c):
            _absorb_point(sponge, g, c)
        self.hp_instance.absorb_into(sponge, g)


class NarkProofVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec,
                 proof: r1cs_nark_as.Proof):
        r = curve.fr.modulus
        self.hp_proof = HpProofVar(g, curve, proof.hp_proof)
        self.randomness = None
        if proof.randomness is not None:
            pr = proof.randomness
            ints = fp.array_to_ints(curve.fr, pr.r1cs_r_input)
            r_input = [nn.EmulatedVar.alloc(g, r, x) for x in ints]
            self.randomness = {
                "r1cs_r_input": r_input,
                "r1cs_r_input_bits": [emulated_to_bits(g, v, 256)
                                      for v in r_input],
                "comms": [
                    _alloc_point(g, curve, scommon.affine_ints(curve, c))
                    for c in (pr.comm_r_a, pr.comm_r_b, pr.comm_r_c)],
            }

    def absorb_randomness_into(self, sponge: SpongeGadget, g: GadgetCS):
        if self.randomness is not None:
            _absorb_scalars_individually(
                sponge, g, self.randomness["r1cs_r_input_bits"])
            for c in self.randomness["comms"]:
                _absorb_point(sponge, g, c)


class ASForR1CSNarkVerifierGadget:
    def __init__(self, curve: CurveSpec):
        self.curve = curve
        self.b3 = (3 * curve.b) % curve.fq.modulus
        self.r = curve.fr.modulus

    def _gamma_bits(self, g: GadgetCS, nark_matrices_hash: bytes,
                    inst: NarkInputInstanceVar) -> List[BoolVar]:
        """NARK challenge re-derivation (reference gadget mod.rs:94-117)."""
        sponge = _domain_sponge(g, R1CS_NARK_DOMAIN)
        sponge.absorb_constant_bytes(nark_matrices_hash)
        _absorb_scalar_stream(sponge, g, inst.r1cs_input_bits)
        inst.first_round_message.absorb_into(sponge, g)
        return sponge.squeeze_challenge_bits(CHALLENGE_SIZE)

    def verify(self, g: GadgetCS, vk: r1cs_nark_as.VerifierKey,
               input_instances: List[NarkInputInstanceVar],
               old_accumulator_instances: List[NarkAccInstanceVar],
               new_acc: NarkAccInstanceVar, proof: NarkProofVar):
        curve, r, b3 = self.curve, self.r, self.b3
        make_zk = proof.randomness is not None

        # zero-input default, mirroring the native verify
        # (schemes/r1cs_nark_as.py:485-486; ref src/r1cs_nark_as/constraints/
        # mod.rs default-input injection)
        if not input_instances and not old_accumulator_instances:
            input_instances = [NarkInputInstanceVar(
                g, curve, r1cs_nark_as.InputInstance.zero(
                    curve, vk.num_instance_variables, False))]

        # Steps 1-2: gamma-blinded first-round commitments (mod.rs:174-233)
        blinded = []  # (comm_a, comm_b, comm_c, comm_prod) per input
        for inst in input_instances:
            msg = inst.first_round_message
            if msg.randomness is not None:
                gamma_bits = self._gamma_bits(g, vk.nark_matrices_hash, inst)
                cra, crb, crc, c1, c2 = msg.randomness
                ca = point_add(g, msg.comm_a,
                               scalar_mul_le(g, cra, gamma_bits, b3), b3)
                cb = point_add(g, msg.comm_b,
                               scalar_mul_le(g, crb, gamma_bits, b3), b3)
                cc = point_add(g, msg.comm_c,
                               scalar_mul_le(g, crc, gamma_bits, b3), b3)
                # comm_prod = comm_c + gamma*comm_1 + gamma^2*comm_2
                g1 = scalar_mul_le(g, c1, gamma_bits, b3)
                g2 = scalar_mul_le(
                    g, scalar_mul_le(g, c2, gamma_bits, b3), gamma_bits, b3)
                cprod = point_add(g, msg.comm_c, point_add(g, g1, g2, b3), b3)
            else:
                ca, cb, cc, cprod = (msg.comm_a, msg.comm_b, msg.comm_c,
                                     msg.comm_c)
            blinded.append((ca, cb, cc, cprod))

        # Step 3-4: HP verify on the blinded instances (mod.rs:240-265,487-495)
        hp_inputs = []
        for ca, cb, cc, cprod in blinded:
            hp = HpInstanceVar.__new__(HpInstanceVar)
            hp.comm_1, hp.comm_2, hp.comm_3 = ca, cb, cprod
            hp_inputs.append(hp)
        hp_olds = [a.hp_instance for a in old_accumulator_instances]
        hp_sponge = _domain_sponge(g, AS_FOR_HP_DOMAIN)
        ASForHPVerifierGadget(curve).verify(
            g, vk.num_constraints, hp_inputs, hp_olds,
            new_acc.hp_instance, proof.hp_proof, sponge=hp_sponge)

        # Step 5: beta challenges (mod.rs:131-167)
        as_sponge = _domain_sponge(g, AS_FOR_R1CS_NARK_DOMAIN)
        as_sponge.absorb_constant_bytes(vk.as_matrices_hash)
        for a in old_accumulator_instances:
            a.absorb_into(as_sponge, g)
        for i in input_instances:
            i.absorb_into(as_sponge, g)
        proof.absorb_randomness_into(as_sponge, g)
        num = (len(input_instances) + len(old_accumulator_instances)
               + (1 if make_zk else 0))
        beta_bits: List[Optional[List[BoolVar]]] = [None]  # beta_0 = 1
        for _ in range(num - 1):
            beta_bits.append(as_sponge.squeeze_challenge_bits(CHALLENGE_SIZE))
        one = nn.EmulatedVar.constant(g, 1)
        betas = [one] + [nn.EmulatedVar.from_bits(g, r, b)
                         for b in beta_bits[1:]]

        # Step 6: combined instance (mod.rs:269-291, order: accs, inputs, zk)
        r1cs_inputs = [a.r1cs_input for a in old_accumulator_instances] + \
                      [i.r1cs_input for i in input_instances]
        comm_seq = [
            [(a.comm_a, a.comm_b, a.comm_c) for a in old_accumulator_instances],
            [(ca, cb, cc) for (ca, cb, cc, _) in blinded],
        ]
        flat_comms = comm_seq[0] + comm_seq[1]
        if make_zk:
            r1cs_inputs.append(proof.randomness["r1cs_r_input"])
            cra, crb, crc = proof.randomness["comms"]
            flat_comms.append((cra, crb, crc))

        # combined r1cs input: for each coordinate j: sum_i beta_i x_ij == X_j
        input_len = len(new_acc.r1cs_input)
        for j in range(input_len):
            nn.enforce_relation(
                g, r,
                mul_terms=[(1, betas[i], r1cs_inputs[i][j])
                           for i in range(len(r1cs_inputs))],
                lin_terms=[(-1, new_acc.r1cs_input[j])])

        # combined commitments
        for which, claimed in ((0, new_acc.comm_a), (1, new_acc.comm_b),
                               (2, new_acc.comm_c)):
            acc = flat_comms[0][which]  # beta_0 = 1
            for i in range(1, len(flat_comms)):
                term = scalar_mul_le(g, flat_comms[i][which], beta_bits[i], b3)
                acc = point_add(g, acc, term, b3)
            point_enforce_equal(g, acc, claimed)


def synthesize_and_check(curve: CurveSpec, vk, input_instances,
                         old_accumulator_instances, new_accumulator_instance,
                         proof) -> bool:
    g = GadgetCS(curve.fq)
    try:
        inputs = [NarkInputInstanceVar(g, curve, i) for i in input_instances]
        olds = [NarkAccInstanceVar(g, curve, a)
                for a in old_accumulator_instances]
        new = NarkAccInstanceVar(g, curve, new_accumulator_instance,
                                 public=True)
        pvar = NarkProofVar(g, curve, proof)
        ASForR1CSNarkVerifierGadget(curve).verify(
            g, vk, inputs, olds, new, pvar)
    except AssertionError:
        return False
    cs = g.finalize()
    return cs.is_satisfied()


def costs_breakdown(curve: CurveSpec, vk, input_instances,
                    old_accumulator_instances, new_accumulator_instance,
                    proof) -> dict:
    g = GadgetCS(curve.fq)
    counts = {}
    base = g.num_constraints
    inputs = [NarkInputInstanceVar(g, curve, i) for i in input_instances]
    counts["input_instances"] = g.num_constraints - base
    base = g.num_constraints
    olds = [NarkAccInstanceVar(g, curve, a) for a in old_accumulator_instances]
    counts["old_accumulators"] = g.num_constraints - base
    base = g.num_constraints
    new = NarkAccInstanceVar(g, curve, new_accumulator_instance, public=True)
    counts["new_accumulator"] = g.num_constraints - base
    base = g.num_constraints
    pvar = NarkProofVar(g, curve, proof)
    counts["proof"] = g.num_constraints - base
    base = g.num_constraints
    ASForR1CSNarkVerifierGadget(curve).verify(g, vk, inputs, olds, new, pvar)
    counts["verify"] = g.num_constraints - base
    counts["total"] = g.num_constraints
    return counts
