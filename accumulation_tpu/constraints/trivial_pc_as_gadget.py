"""ASForTrivialPCVerifierGadget: the trivial-PC accumulation verifier
in-circuit.

TPU-native counterpart of the reference gadget
(/root/reference/src/trivial_pc_as/constraints/mod.rs): allocation split per
the reference harness (vk constant, inputs + proof witness, claimed new
accumulator public input); scalar-field arithmetic via the emulated-limb
gadget (nonnative.py) — the per-input evaluation identity
p_i(c) - v_i = w_i(c) (c - z_i) is two emulated mul terms in one grouped
relation (the reference's lazy `NonNativeFieldMulResultVar` reduction plays
the same role, mod.rs:62-88); linear combinations of commitments consume the
126-bit challenge bits via scalar_mul_le.
"""

from __future__ import annotations

from typing import List

from ..curves.weierstrass import CurveSpec
from ..fields import fp
from ..schemes import common as scommon
from ..schemes import trivial_pc_as
from . import nonnative as nn
from . import r1cs
from .gadgets import (BoolVar, FpVar, GadgetCS, PointVar, SpongeGadget,
                      point_add, point_enforce_equal, scalar_mul_le)
from .hp_as_gadget import _absorb_point, _alloc_point

CP_SIZE = trivial_pc_as.CHALLENGE_POINT_SIZE
LC_SIZE = trivial_pc_as.LINEAR_COMBINATION_CHALLENGE_SIZE


def emulated_to_bits(g: GadgetCS, var: nn.EmulatedVar, nbits: int = 255
                     ) -> List[BoolVar]:
    """Bit-decompose a canonical emulated value (per-limb packing equality)."""
    bits: List[BoolVar] = []
    for li, limb in enumerate(var.limbs):
        lv = nn._split(var.value)[li]
        acc = FpVar.constant(g, 0)
        limb_bits = []
        for i in range(nn.LIMB_BITS):
            b = BoolVar.witness(g, (lv >> i) & 1)
            limb_bits.append(b)
            acc = acc + b.var.scale(1 << i)
        acc.enforce_equal(limb)
        bits.extend(limb_bits)
    return bits[:nbits]


def absorb_scalar_bits(sponge: SpongeGadget, g: GadgetCS,
                       bits: List[BoolVar], total_bytes: int = 32):
    """Native spec: scalar -> 32 LE bytes -> 31-byte chunks as elements.
    elem1 = low 248 bits, elem2 = the rest."""
    chunks = []
    nbits = total_bytes * 8
    for start in range(0, nbits, 248):
        acc = FpVar.constant(g, 0)
        for i in range(start, min(start + 248, nbits)):
            if i < len(bits):
                acc = acc + bits[i].var.scale(1 << (i - start))
        chunks.append(acc)
    sponge.absorb(chunks)


class TrivialPCInstanceVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec,
                 instance: trivial_pc_as.InputInstance, public=False):
        r = curve.fr.modulus
        self.commitment = _alloc_point(
            g, curve, scommon.affine_ints(curve, instance.commitment), public)
        self.point = nn.EmulatedVar.alloc(
            g, r, fp.to_int(curve.fr, instance.point), public)
        self.eval = nn.EmulatedVar.alloc(
            g, r, fp.to_int(curve.fr, instance.eval), public)
        self.point_bits = emulated_to_bits(g, self.point)
        self.eval_bits = emulated_to_bits(g, self.eval)

    def absorb_into(self, sponge: SpongeGadget, g: GadgetCS):
        _absorb_point(sponge, g, self.commitment)
        absorb_scalar_bits(sponge, g, self.point_bits)
        absorb_scalar_bits(sponge, g, self.eval_bits)


class SingleProofVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec,
                 sp: trivial_pc_as.SingleProof):
        r = curve.fr.modulus
        self.witness_commitment = _alloc_point(
            g, curve, scommon.affine_ints(curve, sp.witness_commitment))
        self.witness_eval = nn.EmulatedVar.alloc(
            g, r, fp.to_int(curve.fr, sp.witness_eval))
        self.eval = nn.EmulatedVar.alloc(g, r, fp.to_int(curve.fr, sp.eval))
        self.witness_eval_bits = emulated_to_bits(g, self.witness_eval)
        self.eval_bits = emulated_to_bits(g, self.eval)


class ASForTrivialPCVerifierGadget:
    """Mirrors reference src/trivial_pc_as/constraints/mod.rs."""

    def __init__(self, curve: CurveSpec):
        self.curve = curve
        self.b3 = (3 * curve.b) % curve.fq.modulus
        self.r = curve.fr.modulus

    def verify(self, g: GadgetCS, vk_degree: int,
               input_instances: List[TrivialPCInstanceVar],
               old_accumulator_instances: List[TrivialPCInstanceVar],
               new_acc: TrivialPCInstanceVar,
               proof: List[SingleProofVar]):
        curve, r, b3 = self.curve, self.r, self.b3
        all_instances = input_instances + old_accumulator_instances
        # zero-input default, mirroring the native verify and the reference
        # gadget (src/trivial_pc_as/constraints/mod.rs:137-142)
        if not all_instances:
            all_instances = [TrivialPCInstanceVar(
                g, curve, trivial_pc_as.InputInstance.zero(curve))]
        n = len(all_instances)
        assert len(proof) == n

        # challenge-point sponge (reference scheme mod.rs:522-554)
        cp_sponge = SpongeGadget(g)
        cp_sponge.absorb_u64(vk_degree)
        for inst, sp in zip(all_instances, proof):
            inst.absorb_into(cp_sponge, g)
            _absorb_point(cp_sponge, g, sp.witness_commitment)
        cp_bits = cp_sponge.squeeze_challenge_bits(CP_SIZE)
        cp = nn.EmulatedVar.from_bits(g, r, cp_bits)

        # cp must equal the claimed new accumulator point
        nn.enforce_equal(g, r, cp, new_acc.point)

        # per-input evaluation identity (reference mod.rs:536-544):
        #   sp.eval - inst.eval - w_eval*cp + w_eval*z_i == 0
        for inst, sp in zip(all_instances, proof):
            nn.enforce_relation(
                g, r,
                mul_terms=[(-1, sp.witness_eval, cp),
                           (1, sp.witness_eval, inst.point)],
                lin_terms=[(1, sp.eval), (-1, inst.eval)])

        # linear-combination sponge (reference mod.rs:560-581)
        lc_sponge = SpongeGadget(g)
        absorb_scalar_bits(lc_sponge, g, cp_bits,
                           total_bytes=(CP_SIZE + 7) // 8)
        for sp in proof:
            absorb_scalar_bits(lc_sponge, g, sp.eval_bits)
            absorb_scalar_bits(lc_sponge, g, sp.witness_eval_bits)
        lc_bits = [lc_sponge.squeeze_challenge_bits(LC_SIZE)
                   for _ in range(2 * n)]
        lc_vars = [nn.EmulatedVar.from_bits(g, r, b) for b in lc_bits]

        # combined eval == claimed (reference mod.rs:583-594)
        evals = [sp.eval for sp in proof] + [sp.witness_eval for sp in proof]
        nn.enforce_relation(
            g, r,
            mul_terms=[(1, ch, e) for ch, e in zip(lc_vars, evals)],
            lin_terms=[(-1, new_acc.eval)])

        # combined commitment == claimed (reference mod.rs:596-606)
        comms = [inst.commitment for inst in all_instances] + \
                [sp.witness_commitment for sp in proof]
        acc = scalar_mul_le(g, comms[0], lc_bits[0], b3)
        for ch_bits, comm in zip(lc_bits[1:], comms[1:]):
            acc = point_add(g, acc, scalar_mul_le(g, comm, ch_bits, b3), b3)
        point_enforce_equal(g, acc, new_acc.commitment)


def synthesize_and_check(curve: CurveSpec, vk_degree: int, input_instances,
                         old_accumulator_instances, new_accumulator_instance,
                         proof) -> bool:
    g = GadgetCS(curve.fq)
    try:
        inputs = [TrivialPCInstanceVar(g, curve, i) for i in input_instances]
        olds = [TrivialPCInstanceVar(g, curve, i)
                for i in old_accumulator_instances]
        new = TrivialPCInstanceVar(g, curve, new_accumulator_instance,
                                   public=True)
        pvars = [SingleProofVar(g, curve, sp) for sp in proof]
        ASForTrivialPCVerifierGadget(curve).verify(
            g, vk_degree, inputs, olds, new, pvars)
    except AssertionError:
        # witness generation already detected an unsatisfiable relation
        return False
    cs = g.finalize()
    return cs.is_satisfied()


def costs_breakdown(curve: CurveSpec, vk_degree: int, input_instances,
                    old_accumulator_instances, new_accumulator_instance,
                    proof) -> dict:
    g = GadgetCS(curve.fq)
    counts = {}
    base = g.num_constraints
    inputs = [TrivialPCInstanceVar(g, curve, i) for i in input_instances]
    counts["input_instances"] = g.num_constraints - base
    base = g.num_constraints
    olds = [TrivialPCInstanceVar(g, curve, i)
            for i in old_accumulator_instances]
    counts["old_accumulators"] = g.num_constraints - base
    base = g.num_constraints
    new = TrivialPCInstanceVar(g, curve, new_accumulator_instance, public=True)
    counts["new_accumulator"] = g.num_constraints - base
    base = g.num_constraints
    pvars = [SingleProofVar(g, curve, sp) for sp in proof]
    counts["proof"] = g.num_constraints - base
    base = g.num_constraints
    ASForTrivialPCVerifierGadget(curve).verify(
        g, vk_degree, inputs, olds, new, pvars)
    counts["verify"] = g.num_constraints - base
    counts["total"] = g.num_constraints
    return counts
