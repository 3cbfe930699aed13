"""ASForHPVerifierGadget: the hp_as accumulation verifier in-circuit.

TPU-native counterpart of the reference gadget
(/root/reference/src/hp_as/constraints/mod.rs): re-expresses
`ASForHadamardProducts.verify` as an R1CS over the constraint field Fq for
PCD recursion.  Allocation split mirrors the reference harness
(src/constraints.rs:107-204): vk as constant, input instances and proof as
witnesses, the claimed new accumulator instance as public input; the verify
relation is enforced (the reference returns a Boolean and enforces TRUE).

Deviation (documented): the native scheme's combined challenges mu_i * nu_i
and the zk challenge mu_1 * mu_{m-1} are realised as *cascaded* 128-bit
`scalar_mul_le` applications instead of non-native field products — the
group-element results are identical, and the circuit needs no non-native
arithmetic at all.  nu powers are consumed by Horner chains over the
commitment sequence for the same reason.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..curves.weierstrass import CurveSpec
from ..schemes import common as scommon
from ..schemes import hp_as
from . import gadgets
from .gadgets import (BoolVar, FpVar, GadgetCS, PointVar, SpongeGadget,
                      point_add, point_enforce_equal, point_select,
                      scalar_mul_le)

CHALLENGE_SIZE = hp_as.CHALLENGE_SIZE


def _alloc_point(g: GadgetCS, curve: CurveSpec, pt_affine, public=False
                 ) -> PointVar:
    """Allocate a host affine point ((x, y) ints or None) canonically:
    z booleanity + z=0 -> exactly (0:1:0) + on-curve y^2 = x^3 + b.
    (Without the canonical/on-curve part the absorbing point (0:0:0) would
    satisfy every downstream relation — see gadgets.enforce_point_canonical.)
    """
    var = PointVar.alloc(g, pt_affine, public=public)
    gadgets.enforce_point_canonical(g, var, curve.b)
    return var


def _absorb_point(sponge: SpongeGadget, g: GadgetCS, pt: PointVar):
    """Native spec absorbs [x_affine, y_affine, inf?1:0] ((0,0,1) at inf).

    The point may be a *computed* projective var (arbitrary z), so allocate
    the affine representation and enforce consistency:
      is_inf boolean;  is_inf * z = 0;
      ax*z = x - x*is_inf;  ay*z = y - y*is_inf;   ax*is_inf = ay*is_inf = 0.
    A finite point with is_inf=1 contradicts is_inf*z=0; a point at infinity
    ((0:1:0)) with is_inf=0 forces 1 = ay*0 — unsatisfiable.  Sound for both
    allocated and computed points."""
    p = g.p
    z_val = pt.z.value
    if z_val == 0:
        ax_v, ay_v, inf_v = 0, 0, 1
    else:
        zinv = pow(z_val, -1, p)
        ax_v, ay_v, inf_v = pt.x.value * zinv % p, pt.y.value * zinv % p, 0
    from .gadgets import BoolVar
    is_inf = BoolVar.witness(g, inf_v)
    ax = FpVar.witness(g, ax_v)
    ay = FpVar.witness(g, ay_v)
    (is_inf.var * pt.z).enforce_zero()
    (ax * pt.z + pt.x * is_inf.var - pt.x).enforce_zero()
    (ay * pt.z + pt.y * is_inf.var - pt.y).enforce_zero()
    (ax * is_inf.var).enforce_zero()
    (ay * is_inf.var).enforce_zero()
    sponge.absorb([ax, ay, is_inf.var])


class HpInstanceVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec,
                 instance: hp_as.InputInstance, public=False):
        c1 = scommon.affine_ints(curve, instance.comm_1)
        c2 = scommon.affine_ints(curve, instance.comm_2)
        c3 = scommon.affine_ints(curve, instance.comm_3)
        self.comm_1 = _alloc_point(g, curve, c1, public)
        self.comm_2 = _alloc_point(g, curve, c2, public)
        self.comm_3 = _alloc_point(g, curve, c3, public)

    def absorb_into(self, sponge: SpongeGadget, g: GadgetCS):
        for c in (self.comm_1, self.comm_2, self.comm_3):
            _absorb_point(sponge, g, c)


class HpProofVar:
    def __init__(self, g: GadgetCS, curve: CurveSpec, proof: hp_as.Proof):
        import jax.numpy as jnp
        from ..curves import weierstrass as wst
        low_pts = wst.affine_to_ints(curve, proof.product_poly_comm_low)
        high_pts = wst.affine_to_ints(curve, proof.product_poly_comm_high)
        self.low = [_alloc_point(g, curve, p) for p in low_pts]
        self.high = [_alloc_point(g, curve, p) for p in high_pts]
        self.hiding = None
        if proof.hiding_comms is not None:
            hc = proof.hiding_comms
            self.hiding = [
                _alloc_point(g, curve, scommon.affine_ints(curve, c))
                for c in (hc.comm_1, hc.comm_2, hc.comm_3)]


class ASForHPVerifierGadget:
    """Mirrors reference src/hp_as/constraints/mod.rs:280-369."""

    def __init__(self, curve: CurveSpec):
        self.curve = curve
        self.b3 = (3 * curve.b) % curve.fq.modulus

    def verify(self, g: GadgetCS, vk_vec_len: int,
               input_instances: List[HpInstanceVar],
               old_accumulator_instances: List[HpInstanceVar],
               new_accumulator_instance: HpInstanceVar,
               proof: HpProofVar, sponge: Optional[SpongeGadget] = None):
        """Synthesises the verify relation; enforces success.

        `sponge` may be pre-seeded (domain-forked) by a composing gadget
        (r1cs_nark_as), mirroring the native optional-sponge parameter."""
        b3 = self.b3
        make_zk = proof.hiding is not None
        input_instances = list(input_instances)
        num_all = len(input_instances) + len(old_accumulator_instances)
        # default input when there are none, and the zk placeholder at
        # m == 1 — mirrors both the native prover/verifier defaults
        # (schemes/hp_as.py:384-387) and the reference gadget's constant
        # injections (src/hp_as/constraints/mod.rs:303-325)
        if num_all == 0:
            input_instances.append(HpInstanceVar(
                g, self.curve, hp_as.InputInstance.zero(self.curve)))
            num_all += 1
        if make_zk and num_all == 1:
            input_instances.append(HpInstanceVar(
                g, self.curve, hp_as.InputInstance.zero(self.curve)))
            num_all += 1
        all_instances = input_instances + old_accumulator_instances
        m = len(all_instances)
        assert len(proof.low) == m - 1 and len(proof.high) == m - 1

        # Fiat-Shamir round 1 (reference gadget mod.rs:70-128)
        if sponge is None:
            sponge = SpongeGadget(g)
        sponge.absorb_u64(vk_vec_len)
        for inst in all_instances:
            inst.absorb_into(sponge, g)
        if make_zk:
            for c in proof.hiding:
                _absorb_point(sponge, g, c)

        mu_bits: List[Optional[List[BoolVar]]] = [None]  # mu_0 = 1
        for _ in range(m - 1):
            mu_bits.append(sponge.squeeze_challenge_bits(CHALLENGE_SIZE))

        for c in proof.low:
            _absorb_point(sponge, g, c)
        for c in proof.high:
            _absorb_point(sponge, g, c)
        nu_bits = sponge.squeeze_challenge_bits(CHALLENGE_SIZE)

        def mul_mu(i: int, pt: PointVar) -> PointVar:
            if mu_bits[i] is None:
                return pt
            return scalar_mul_le(g, pt, mu_bits[i], b3)

        def mul_nu(pt: PointVar) -> PointVar:
            return scalar_mul_le(g, pt, nu_bits, b3)

        def horner(points: List[PointVar]) -> PointVar:
            """sum_j nu^j * points[j] via Horner (high to low)."""
            acc = points[-1]
            for pt in reversed(points[:-1]):
                acc = point_add(g, mul_nu(acc), pt, b3)
            return acc

        # comb_1 = sum nu^i (mu_i C1_i)  (+ mu_m H1 = mu_1 (mu_{m-1} H1))
        comb_1 = horner([mul_mu(i, inst.comm_1)
                         for i, inst in enumerate(all_instances)])
        if make_zk:
            h1 = mul_mu(1, mul_mu(m - 1, proof.hiding[0])) if m > 1 \
                else proof.hiding[0]
            comb_1 = point_add(g, comb_1, h1, b3)

        # comb_2 = sum nu^i C2_{m-1-i}  (+ mu_1 H2)
        comb_2 = horner([all_instances[m - 1 - i].comm_2 for i in range(m)])
        if make_zk:
            comb_2 = point_add(g, comb_2, mul_mu(1, proof.hiding[1]), b3)

        # comb_3 = sum_{j} nu^j D_j with D_{m-1} = sum mu_i C3_i (+ mu_m H3)
        inner = horner_free = None
        inner = all_instances[0].comm_3  # mu_0 = 1
        for i in range(1, m):
            inner = point_add(g, inner, mul_mu(i, all_instances[i].comm_3), b3)
        if make_zk:
            h3 = mul_mu(1, mul_mu(m - 1, proof.hiding[2])) if m > 1 \
                else proof.hiding[2]
            inner = point_add(g, inner, h3, b3)
        d_seq = proof.low + [inner] + proof.high  # length 2m-1
        comb_3 = horner(d_seq)

        point_enforce_equal(g, comb_1, new_accumulator_instance.comm_1)
        point_enforce_equal(g, comb_2, new_accumulator_instance.comm_2)
        point_enforce_equal(g, comb_3, new_accumulator_instance.comm_3)


def costs_breakdown(curve: CurveSpec, vk_vec_len: int, input_instances,
                    old_accumulator_instances, new_accumulator_instance,
                    proof) -> dict:
    """Constraint-cost profile mirroring `print_costs_breakdown`
    (reference src/constraints.rs:206-306)."""
    g = GadgetCS(curve.fq)
    counts = {}
    base = g.num_constraints
    inputs = [HpInstanceVar(g, curve, i) for i in input_instances]
    counts["input_instances"] = g.num_constraints - base
    base = g.num_constraints
    olds = [HpInstanceVar(g, curve, i) for i in old_accumulator_instances]
    counts["old_accumulators"] = g.num_constraints - base
    base = g.num_constraints
    new = HpInstanceVar(g, curve, new_accumulator_instance, public=True)
    counts["new_accumulator"] = g.num_constraints - base
    base = g.num_constraints
    pvar = HpProofVar(g, curve, proof)
    counts["proof"] = g.num_constraints - base
    base = g.num_constraints
    ASForHPVerifierGadget(curve).verify(
        g, vk_vec_len, inputs, olds, new, pvar)
    counts["verify"] = g.num_constraints - base
    counts["total"] = g.num_constraints
    return counts


def synthesize_and_check(curve: CurveSpec, vk_vec_len: int, input_instances,
                         old_accumulator_instances, new_accumulator_instance,
                         proof) -> bool:
    """Full gadget synthesis; returns constraint-system satisfaction."""
    g = GadgetCS(curve.fq)
    inputs = [HpInstanceVar(g, curve, i) for i in input_instances]
    olds = [HpInstanceVar(g, curve, i) for i in old_accumulator_instances]
    new = HpInstanceVar(g, curve, new_accumulator_instance, public=True)
    pvar = HpProofVar(g, curve, proof)
    ASForHPVerifierGadget(curve).verify(
        g, vk_vec_len, inputs, olds, new, pvar)
    cs = g.finalize()
    return cs.is_satisfied()
