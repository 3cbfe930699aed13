"""ASForIpaPCVerifierGadget: the IPA-PC accumulation verifier in-circuit.

TPU-native counterpart of the reference gadget
(/root/reference/src/ipa_pc_as/constraints/mod.rs): per-input in-circuit
succinct checks via the IPA transcript replay (the
`IpaPCSuccinctCheckGadget` role, mod.rs:92-130), lambda-combination of final
commitment keys (mod.rs:150-251), the 184-bit challenge-point re-derivation
(mod.rs:254-310), and the combined h-polynomial evaluation at the claimed
point (mod.rs:314-334).

Scalar-field values (evaluations, xi inverses, the folded scalar c) are
emulated-limb vars; round-challenge inverses are allocated and certified by
one non-native product constraint each (xi * xi_inv == 1).  All group
arithmetic uses the complete projective point gadget.
"""

from __future__ import annotations

from typing import List, Optional

from ..curves.weierstrass import CurveSpec
from ..fields import fp
from ..ops.sponge import AS_FOR_IPA_PC_DOMAIN, IPA_PC_DOMAIN
from ..pc import ipa_pc
from ..schemes import common as scommon
from ..schemes import ipa_pc_as
from . import nonnative as nn
from .gadgets import (BoolVar, FpVar, GadgetCS, PointVar, SpongeGadget,
                      point_add, point_enforce_equal, scalar_mul_le)
from .hp_as_gadget import _absorb_point, _alloc_point
from .r1cs_nark_as_gadget import _domain_sponge
from .trivial_pc_as_gadget import absorb_scalar_bits, emulated_to_bits

LC_SIZE = ipa_pc_as.LINEAR_COMBINATION_CHALLENGE_SIZE
CP_SIZE = ipa_pc_as.CHALLENGE_POINT_SIZE
CHALLENGE_SIZE = ipa_pc.CHALLENGE_SIZE


def _alloc_scalar(g, r, value_arr, curve, public=False):
    v = nn.EmulatedVar.alloc(g, r, fp.to_int(curve.fr, value_arr), public)
    return v, emulated_to_bits(g, v, 256)


def _mul_out(g, r, a: nn.EmulatedVar, b: nn.EmulatedVar,
             value: int) -> nn.EmulatedVar:
    """Allocate c = a*b (mod r) and enforce."""
    c = nn.EmulatedVar.alloc(g, r, value)
    nn.enforce_mul_equal(g, r, a, b, c)
    return c


class IpaProofVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec, proof: ipa_pc.Proof):
        from ..curves import weierstrass as wst
        r = curve.fr.modulus
        self.l_vec = [_alloc_point(g, curve, pt)
                      for pt in wst.affine_to_ints(curve, proof.l_vec)]
        self.r_vec = [_alloc_point(g, curve, pt)
                      for pt in wst.affine_to_ints(curve, proof.r_vec)]
        self.final_comm_key = _alloc_point(
            g, curve, scommon.affine_ints(curve, proof.final_comm_key))
        self.c, self.c_bits = _alloc_scalar(g, r, proof.c, curve)
        self.hiding_comm = None
        self.rand = None
        if proof.hiding_comm is not None:
            self.hiding_comm = _alloc_point(
                g, curve, scommon.affine_ints(curve, proof.hiding_comm))
        if proof.rand is not None:
            self.rand, self.rand_bits = _alloc_scalar(g, r, proof.rand, curve)


class IpaInstanceVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec,
                 instance: ipa_pc_as.InputInstance, public=False,
                 with_proof=True):
        r = curve.fr.modulus
        self.commitment = _alloc_point(
            g, curve, scommon.affine_ints(curve, instance.ipa_commitment),
            public)
        self.point, self.point_bits = _alloc_scalar(
            g, r, instance.point, curve, public)
        self.evaluation, self.eval_bits = _alloc_scalar(
            g, r, instance.evaluation, curve, public)
        # the claimed new accumulator's own ipa proof is not consulted by
        # verify (it is checked when the accumulator is folded next round or
        # by the decider), so it need not be allocated for the public slot
        self.proof = (IpaProofVar(g, curve, instance.ipa_proof)
                      if with_proof else None)


class ASForIpaPCVerifierGadget:
    def __init__(self, curve: CurveSpec, svk: ipa_pc.SuccinctVerifierKey,
                 ck_linear: ipa_pc.CommitterKey):
        self.curve = curve
        self.b3 = (3 * curve.b) % curve.fq.modulus
        self.r = curve.fr.modulus
        # constant key points (host ints)
        self.h_pt = scommon.affine_ints(curve, svk.h)
        self.s_pt = scommon.affine_ints(curve, svk.s)
        from ..curves import weierstrass as wst
        self.lin_gens = wst.affine_to_ints(curve, ck_linear.comm_key)

    def _const_point(self, g, pt) -> PointVar:
        if pt is None:
            return PointVar.identity(g)
        return PointVar(FpVar.constant(g, pt[0]), FpVar.constant(g, pt[1]),
                        FpVar.constant(g, 1))

    # -- in-circuit succinct check ------------------------------------------

    def _succinct_check(self, g: GadgetCS, inst: IpaInstanceVar):
        """Returns (xi_inv vars, xi_inv bit lists, U point, final key point).

        Mirrors pc/ipa_pc.py's transcript spec steps 1-6 (enforced)."""
        curve, r, b3 = self.curve, self.r, self.b3
        sponge = _domain_sponge(g, IPA_PC_DOMAIN)
        _absorb_point(sponge, g, inst.commitment)
        absorb_scalar_bits(sponge, g, inst.point_bits)
        absorb_scalar_bits(sponge, g, inst.eval_bits)
        comm = inst.commitment
        proof = inst.proof
        if proof.hiding_comm is not None:
            _absorb_point(sponge, g, proof.hiding_comm)
            alpha_bits = sponge.squeeze_challenge_bits(CHALLENGE_SIZE)
            comm = point_add(
                g, comm, scalar_mul_le(g, proof.hiding_comm, alpha_bits, b3),
                b3)
        if proof.rand is not None:
            absorb_scalar_bits(sponge, g, proof.rand_bits)
            s_const = self._const_point(g, self.s_pt)
            neg_s = PointVar(s_const.x, FpVar.constant(g, 0) - s_const.y,
                             s_const.z)
            comm = point_add(
                g, comm, scalar_mul_le(g, neg_s, proof.rand_bits, b3), b3)
        xi0_bits = sponge.squeeze_challenge_bits(CHALLENGE_SIZE)
        u = scalar_mul_le(g, self._const_point(g, self.h_pt), xi0_bits, b3)
        c_acc = point_add(
            g, comm, scalar_mul_le(g, u, inst.eval_bits, b3), b3)

        k = len(proof.l_vec)
        xi_invs, xi_inv_bits = [], []
        for i in range(k):
            _absorb_point(sponge, g, proof.l_vec[i])
            _absorb_point(sponge, g, proof.r_vec[i])
            bits = sponge.squeeze_challenge_bits(CHALLENGE_SIZE)
            xi = nn.EmulatedVar.from_bits(g, r, bits)
            xi_int = sum(b.value << j for j, b in enumerate(bits))
            xi_inv_int = pow(xi_int, -1, r) if xi_int % r else 0
            xi_inv = nn.EmulatedVar.alloc(g, r, xi_inv_int)
            one = nn.EmulatedVar.constant(g, 1)
            nn.enforce_relation(g, r, [(1, xi, xi_inv)], [(-1, one)])
            xi_inv_b = emulated_to_bits(g, xi_inv, 256)
            c_acc = point_add(
                g, c_acc,
                point_add(g, scalar_mul_le(g, proof.l_vec[i], bits, b3),
                          scalar_mul_le(g, proof.r_vec[i], xi_inv_b, b3), b3),
                b3)
            xi_invs.append(xi_inv)
            xi_inv_bits.append(xi_inv_b)

        # h(z) at the input's own point is not needed; the final check uses
        # b = h(point):
        h_at_point = self._eval_h(g, xi_invs, inst.point)
        cb = _mul_out(g, r, proof.c, h_at_point,
                      proof.c.value * h_at_point.value % r)
        cb_bits = emulated_to_bits(g, cb, 256)
        expect = point_add(
            g, scalar_mul_le(g, proof.final_comm_key, proof.c_bits, b3),
            scalar_mul_le(g, u, cb_bits, b3), b3)
        point_enforce_equal(g, c_acc, expect)
        return xi_invs, xi_inv_bits, proof.final_comm_key

    def _eval_h(self, g, xi_invs: List[nn.EmulatedVar],
                point: nn.EmulatedVar) -> nn.EmulatedVar:
        """h(z) = prod_j (1 + xi_inv_{k-j} z^{2^j}) with certified squares."""
        r = self.r
        k = len(xi_invs)
        acc = nn.EmulatedVar.constant(g, 1)
        zpow = point
        for j in range(k):
            xi_inv = xi_invs[k - 1 - j]
            term_val = (1 + xi_inv.value * zpow.value) % r
            term = nn.EmulatedVar.alloc(g, r, term_val)
            one = nn.EmulatedVar.constant(g, 1)
            nn.enforce_relation(g, r, [(1, xi_inv, zpow)],
                                [(1, one), (-1, term)])
            acc = _mul_out(g, r, acc, term, acc.value * term.value % r)
            if j + 1 < k:
                zpow = _mul_out(g, r, zpow, zpow,
                                zpow.value * zpow.value % r)
        return acc

    # -- full verify ---------------------------------------------------------

    def verify(self, g: GadgetCS,
               input_instances: List[IpaInstanceVar],
               old_accumulator_instances: List[IpaInstanceVar],
               new_acc: IpaInstanceVar,
               proof_randomness=None,
               rand_vars=None):
        """proof_randomness: native ipa_pc_as.Randomness or None; rand_vars
        are its allocated circuit variables (built by synthesize helpers)."""
        curve, r, b3 = self.curve, self.r, self.b3
        all_instances = input_instances + old_accumulator_instances

        checks = [self._succinct_check(g, inst) for inst in all_instances]

        # zk linear polynomial commitment re-computation (mod.rs:756-766)
        lin_comm_var = None
        lin_coeff_bits = None
        if rand_vars is not None:
            lin_vars, lin_bits, lin_comm_var, rand_var, rand_bits = rand_vars
            lin_coeff_bits = lin_bits
            g0 = self._const_point(g, self.lin_gens[0])
            g1 = self._const_point(g, self.lin_gens[1])
            expect = point_add(
                g, scalar_mul_le(g, g0, lin_bits[0], b3),
                scalar_mul_le(g, g1, lin_bits[1], b3), b3)
            point_enforce_equal(g, expect, lin_comm_var)

        # lambda challenges (mod.rs:267-299)
        lc_sponge = _domain_sponge(g, AS_FOR_IPA_PC_DOMAIN)
        if rand_vars is not None:
            absorb_scalar_bits(lc_sponge, g, lin_bits[0])
            absorb_scalar_bits(lc_sponge, g, lin_bits[1])
            _absorb_point(lc_sponge, g, lin_comm_var)
        for (xi_invs, xi_inv_bits, final_key) in checks:
            for bits in xi_inv_bits:
                absorb_scalar_bits(lc_sponge, g, bits)
            _absorb_point(lc_sponge, g, final_key)
        lam_bits = [lc_sponge.squeeze_challenge_bits(LC_SIZE)
                    for _ in checks]
        lams = [nn.EmulatedVar.from_bits(g, r, b) for b in lam_bits]

        # combined commitment (mod.rs:301-339)
        combined = None
        for lamb, (xi_invs, xi_inv_bits, final_key) in zip(lam_bits, checks):
            term = scalar_mul_le(g, final_key, lamb, b3)
            combined = term if combined is None else point_add(
                g, combined, term, b3)
        if combined is None:
            combined = PointVar.identity(g)
        if rand_vars is not None:
            combined = point_add(g, combined, lin_comm_var, b3)
            randomized = point_add(
                g, combined,
                scalar_mul_le(g, self._const_point(g, self.s_pt),
                              rand_bits, b3), b3)
        else:
            randomized = combined
        point_enforce_equal(g, randomized, new_acc.commitment)

        # challenge point (mod.rs:254-310 analog of scheme _new_challenge)
        cp_sponge = _domain_sponge(g, AS_FOR_IPA_PC_DOMAIN)
        _absorb_point(cp_sponge, g, combined)
        if rand_vars is not None:
            # native absorbs the 64-byte concatenation of both coefficients
            stream = []
            all_bits = (list(lin_bits[0]) + [None] * (256 - len(lin_bits[0]))
                        + list(lin_bits[1]) + [None] * (256 - len(lin_bits[1])))
            for start in range(0, 512, 248):
                acc = FpVar.constant(g, 0)
                for i in range(start, min(start + 248, 512)):
                    if all_bits[i] is not None:
                        acc = acc + all_bits[i].var.scale(1 << (i - start))
                stream.append(acc)
            cp_sponge.absorb(stream)
        for lamb, (xi_invs, xi_inv_bits, final_key) in zip(lam_bits, checks):
            absorb_scalar_bits(cp_sponge, g, lamb,
                               total_bytes=(LC_SIZE + 7) // 8)
            for bits in xi_inv_bits:
                absorb_scalar_bits(cp_sponge, g, bits)
        cp_bits = cp_sponge.squeeze_challenge_bits(CP_SIZE)
        cp = nn.EmulatedVar.from_bits(g, r, cp_bits)
        nn.enforce_equal(g, r, cp, new_acc.point)

        # combined evaluation at the new point (mod.rs:314-334)
        h_evals = []
        for (xi_invs, xi_inv_bits, final_key) in checks:
            h_evals.append(self._eval_h(g, xi_invs, new_acc.point))
        mul_terms = [(1, lamb, he) for lamb, he in zip(lams, h_evals)]
        lin_terms = [(-1, new_acc.evaluation)]
        if rand_vars is not None:
            # lin polynomial evaluated at cp: c0 + c1*cp
            mul_terms.append((1, lin_vars[1], cp))
            lin_terms.append((1, lin_vars[0]))
        nn.enforce_relation(g, r, mul_terms, lin_terms)


def costs_breakdown(curve: CurveSpec, vk: ipa_pc_as.VerifierKey,
                    input_instances, old_accumulator_instances,
                    new_accumulator_instance, proof) -> dict:
    """Constraint-cost profile (print_costs_breakdown analog)."""
    g = GadgetCS(curve.fq)
    gadget = ASForIpaPCVerifierGadget(curve, vk.ipa_svk, vk.ipa_ck_linear)
    counts = {}
    base = g.num_constraints
    inputs = [IpaInstanceVar(g, curve, i) for i in input_instances]
    counts["input_instances"] = g.num_constraints - base
    base = g.num_constraints
    olds = [IpaInstanceVar(g, curve, a) for a in old_accumulator_instances]
    counts["old_accumulators"] = g.num_constraints - base
    base = g.num_constraints
    new = IpaInstanceVar(g, curve, new_accumulator_instance, public=True,
                         with_proof=False)
    counts["new_accumulator"] = g.num_constraints - base
    base = g.num_constraints
    gadget.verify(g, inputs, olds, new, proof, None)
    counts["verify"] = g.num_constraints - base
    counts["total"] = g.num_constraints
    return counts


def synthesize_and_check(curve: CurveSpec, vk: ipa_pc_as.VerifierKey,
                         input_instances, old_accumulator_instances,
                         new_accumulator_instance, proof) -> bool:
    g = GadgetCS(curve.fq)
    r = curve.fr.modulus
    gadget = ASForIpaPCVerifierGadget(curve, vk.ipa_svk, vk.ipa_ck_linear)
    # zero-input default (non-zk only), mirroring the native verify
    # (schemes/ipa_pc_as.py:323-324): the zero-polynomial opening claim
    # derived from the verifier key's default proof
    if not input_instances and not old_accumulator_instances and proof is None:
        input_instances = [
            ipa_pc_as.AtomicASForInnerProductArgPC(curve)._default_input(vk)]
    try:
        inputs = [IpaInstanceVar(g, curve, i) for i in input_instances]
        olds = [IpaInstanceVar(g, curve, a)
                for a in old_accumulator_instances]
        new = IpaInstanceVar(g, curve, new_accumulator_instance, public=True,
                             with_proof=False)
        rand_vars = None
        if proof is not None:
            lin0, lin0_bits = _alloc_scalar(
                g, r, proof.random_linear_polynomial[0], curve)
            lin1, lin1_bits = _alloc_scalar(
                g, r, proof.random_linear_polynomial[1], curve)
            lin_comm = _alloc_point(
                g, curve, scommon.affine_ints(
                    curve, proof.random_linear_polynomial_commitment))
            rand_v, rand_bits = _alloc_scalar(
                g, r, proof.commitment_randomness, curve)
            rand_vars = ((lin0, lin1), (lin0_bits, lin1_bits), lin_comm,
                         rand_v, rand_bits)
        gadget.verify(g, inputs, olds, new, proof, rand_vars)
    except AssertionError:
        return False
    cs = g.finalize()
    return cs.is_satisfied()
