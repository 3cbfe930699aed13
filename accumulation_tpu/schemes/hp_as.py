"""ASForHadamardProducts: accumulation scheme for Hadamard-product claims.

TPU-native re-implementation of the reference scheme (BCLMS20 §7,
/root/reference/src/hp_as/mod.rs).  An input claims a ◦ b = c under Pedersen
commitments (comm_1, comm_2, comm_3); the prover folds m claims into one via
the product polynomial a(X, µ) ◦ b(X).

Behavioural parity, with the hot loops restructured tensor-first:

  * t-vec computation (reference compute_t_vecs, mod.rs:288-349: a per-
    coordinate naive poly product) becomes one batched outer product over the
    input axis: P[i,j] = (µ_i a_i) ◦ b_rev_j, then anti-diagonal sums — all
    (m², n)-shaped vector ops on device;
  * the 2m-2 product-poly commitments (mod.rs:354-388) are one batched
    Pedersen MSM;
  * µ challenges (mod.rs:233-253): µ_0 = 1, µ_1.. squeezed at 128 bits, plus
    µ_1·µ_{m-1} appended under zk;  ν challenges (mod.rs:256-275) are powers
    of one 128-bit squeeze;
  * combined instance/witness linear combinations follow mod.rs:409-607,
    including the reversed-ν pairing of comm_2/b and the ν^{m-1} scaling of
    the comm_3 addend;
  * zero-input default and zk placeholder inputs per mod.rs:684-710.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.accumulation import AccumulationScheme, InstanceWitnessPair, MakeZK
from ..core import errors
from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..ops import poly as poly_ops
from ..ops.sponge import PoseidonSponge
from ..pc import pedersen
from . import common

CHALLENGE_SIZE = 128  # reference mod.rs:29


@dataclass
class InputInstance:
    """Pedersen commitments to a, b, a◦b (reference data_structures.rs:13-33)."""

    comm_1: Affine
    comm_2: Affine
    comm_3: Affine

    def absorb_into(self, curve: CurveSpec, sponge: PoseidonSponge):
        for c in (self.comm_1, self.comm_2, self.comm_3):
            common.absorb_affine(sponge, curve, c)

    @staticmethod
    def zero(curve: CurveSpec) -> "InputInstance":
        z = wst.affine_zero(curve, ())
        return InputInstance(z, z, z)

    def eq(self, curve: CurveSpec, other: "InputInstance") -> bool:
        return all(
            bool(np.asarray(wst.affine_eq(a, b)))
            for a, b in ((self.comm_1, other.comm_1),
                         (self.comm_2, other.comm_2),
                         (self.comm_3, other.comm_3))
        )


@dataclass
class InputWitnessRandomness:
    rand_1: jnp.ndarray
    rand_2: jnp.ndarray
    rand_3: jnp.ndarray


@dataclass
class InputWitness:
    """a/b vectors + optional hiding randomness (data_structures.rs:53-88)."""

    a_vec: jnp.ndarray  # (n, NLIMBS)
    b_vec: jnp.ndarray
    randomness: Optional[InputWitnessRandomness] = None

    @staticmethod
    def zero(vec_len: int) -> "InputWitness":
        return InputWitness(
            common.fr_zeros((vec_len,)), common.fr_zeros((vec_len,)), None)


@dataclass
class ProofHidingCommitments:
    comm_1: Affine
    comm_2: Affine
    comm_3: Affine


@dataclass
class Proof:
    """Commitments to t-vecs (excluding the middle), split low/high, plus
    optional hiding commitments (data_structures.rs:94-158)."""

    product_poly_comm_low: Affine   # (m-1,) batched
    product_poly_comm_high: Affine  # (m-1,)
    hiding_comms: Optional[ProofHidingCommitments] = None


def compute_hp(curve: CurveSpec, a_vec, b_vec):
    """Hadamard product (reference mod.rs:278-285)."""
    return fp.mul(curve.fr, a_vec, b_vec)


class ASForHadamardProducts(AccumulationScheme):
    def __init__(self, curve: CurveSpec):
        self.curve = curve

    # -- keygen -------------------------------------------------------------

    def setup(self, rng=None):
        return None

    def index(self, public_params, predicate_params, predicate_index: int):
        pp = pedersen.setup(self.curve, predicate_index)
        ck = pedersen.trim(pp, predicate_index)
        return ck, predicate_index, ck

    # -- challenge derivation ------------------------------------------------

    @staticmethod
    def _squeeze_mu_challenges(sponge, num_inputs: int, make_zk: bool,
                               fr) -> List[int]:
        mus = [1]
        if num_inputs > 1:
            mus += sponge.squeeze_nonnative_truncated(
                CHALLENGE_SIZE, num_inputs - 1)
        if make_zk:
            mus.append(mus[1] * mus[num_inputs - 1] % fr.modulus)
        return mus

    @staticmethod
    def _squeeze_nu_challenges(sponge, num_inputs: int, fr) -> List[int]:
        nu = sponge.squeeze_nonnative_truncated(CHALLENGE_SIZE)[0]
        out, cur = [], 1
        for _ in range(2 * num_inputs - 1):
            out.append(cur)
            cur = cur * nu % fr.modulus
        return out

    # -- prover core ---------------------------------------------------------

    def _compute_t_vecs(self, a_stack, b_stack, mu, hiding_vecs):
        """a_stack, b_stack: (m, n, L); mu: (m(+1), L) Montgomery.

        Returns t: (2m-1, n, L) — coefficient vectors of the product
        polynomial, tensorised version of reference mod.rs:288-349.
        """
        fr = self.curve.fr
        m = a_stack.shape[0]
        a_scaled = fp.mul(fr, a_stack, mu[:m, None, :])
        b_rev = b_stack[::-1]
        if hiding_vecs is not None:
            hiding_a, hiding_b = hiding_vecs
            a_scaled = a_scaled.at[0].set(fp.add(
                fr, a_scaled[0], fp.mul(fr, hiding_a, mu[m][None, :])))
            b_rev = b_rev.at[0].set(fp.add(
                fr, b_rev[0], fp.mul(fr, hiding_b, mu[1][None, :])))
        # t_k = sum_{i+j=k} a_scaled[i] ◦ b_rev[j]
        prods = fp.mul(fr, a_scaled[:, None], b_rev[None, :])  # (m, m, n, L)
        n = a_stack.shape[1]
        t = jnp.zeros((2 * m - 1, n, fp.NLIMBS), jnp.uint32)
        for k in range(2 * m - 1):
            terms = [prods[i, k - i] for i in range(max(0, k - m + 1), min(k, m - 1) + 1)]
            acc = terms[0]
            for term in terms[1:]:
                acc = fp.add(fr, acc, term)
            t = t.at[k].set(acc)
        return t

    def _combine_commitments(self, comms: Affine, challenges, extra=None):
        """sum_i challenges[i]*comms[i] (+ extra projective point)."""
        acc = wst.lincomb(self.curve, wst.from_affine(self.curve, comms), challenges)
        if extra is not None:
            acc = wst.proj_add(self.curve, acc, extra)
        return acc

    def _combined_instance(self, instances: List[InputInstance], proof: Proof,
                           mu_m, nu_m, cc_m, make_zk: bool) -> InputInstance:
        """Reference compute_combined_hp_commitments (mod.rs:409-479)."""
        curve = self.curve
        m = len(instances)
        c1 = common.stack_affine([i.comm_1 for i in instances])
        c2 = common.stack_affine([i.comm_2 for i in instances])
        c3 = common.stack_affine([i.comm_3 for i in instances])

        h1 = h2 = h3 = None
        if make_zk:
            hc = proof.hiding_comms
            h1 = wst.scalar_mul(curve, wst.from_affine(curve, hc.comm_1), mu_m[m])
            h2 = wst.scalar_mul(curve, wst.from_affine(curve, hc.comm_2), mu_m[1])
            h3 = wst.scalar_mul(curve, wst.from_affine(curve, hc.comm_3), mu_m[m])

        comb_1 = self._combine_commitments(c1, cc_m[:m], h1)
        comb_2 = self._combine_commitments(
            Affine(c2.x[::-1], c2.y[::-1], c2.inf[::-1]), nu_m[:m], h2)
        low_addend = self._combine_commitments(
            proof.product_poly_comm_low, nu_m[:m - 1]) if m > 1 else None
        high_addend = self._combine_commitments(
            proof.product_poly_comm_high, nu_m[m:2 * m - 1]) if m > 1 else None
        comm3_inner = self._combine_commitments(c3, mu_m[:m], h3)
        comm3_scaled = wst.scalar_mul(curve, comm3_inner, nu_m[m - 1])
        comb_3 = comm3_scaled
        if low_addend is not None:
            comb_3 = wst.proj_add(curve, low_addend,
                                 wst.proj_add(curve, high_addend, comm3_scaled))
        batch = wst.to_affine(curve, wst.Projective(
            jnp.stack([comb_1.x, comb_2.x, comb_3.x]),
            jnp.stack([comb_1.y, comb_2.y, comb_3.y]),
            jnp.stack([comb_1.z, comb_2.z, comb_3.z]),
        ))
        pts = common.unstack_affine(batch)
        return InputInstance(pts[0], pts[1], pts[2])

    # -- prove --------------------------------------------------------------

    def prove(self, prover_key: pedersen.PedersenKey, inputs, old_accumulators,
              make_zk: MakeZK = None, sponge: Optional[PoseidonSponge] = None):
        curve, fr = self.curve, self.curve.fr
        sponge = sponge if sponge is not None else PoseidonSponge(curve.fq)
        make_zk = make_zk or MakeZK.Disabled()
        make_zk_enabled, rng = make_zk.into_components()

        inputs = list(inputs)
        old_accumulators = list(old_accumulators)
        num_all = len(inputs) + len(old_accumulators)

        if not make_zk_enabled and num_all > 0:
            for pair in inputs + old_accumulators:
                if pair.witness.randomness is not None:
                    raise errors.MissingRng(
                        "Accumulating inputs with hiding requires rng.")

        # vector length (reference mod.rs:676-682)
        if old_accumulators:
            hp_vec_len = old_accumulators[0].witness.a_vec.shape[0]
        elif inputs:
            hp_vec_len = inputs[0].witness.a_vec.shape[0]
        else:
            hp_vec_len = prover_key.supported_num_elems

        if num_all == 0:
            inputs.append(InstanceWitnessPair(
                InputInstance.zero(curve), InputWitness.zero(hp_vec_len)))
            num_all += 1
        if make_zk_enabled and num_all == 1:
            inputs.append(InstanceWitnessPair(
                InputInstance.zero(curve), InputWitness.zero(hp_vec_len)))
            num_all += 1

        all_pairs = inputs + old_accumulators
        all_instances = [p.instance for p in all_pairs]
        all_witnesses = [p.witness for p in all_pairs]
        for w in all_witnesses:
            if w.a_vec.shape[0] != hp_vec_len or w.b_vec.shape[0] != hp_vec_len:
                raise errors.MalformedInput(
                    "All Hadamard-product vectors must have equal lengths")
            if hp_vec_len > prover_key.supported_num_elems:
                raise errors.MalformedInput(
                    "vector length exceeds the prover key's supported length")
        m = num_all

        a_stack = jnp.stack([w.a_vec for w in all_witnesses])  # (m, n, L)
        b_stack = jnp.stack([w.b_vec for w in all_witnesses])

        # zk randomness (reference generate_prover_randomness, mod.rs:179-230)
        hiding_vecs = hiding_rands = hiding_comms = None
        if make_zk_enabled:
            assert rng is not None
            ha = fp.random_elements(fr, rng, (hp_vec_len,))
            hb = fp.random_elements(fr, rng, (hp_vec_len,))
            r1, r2, r3 = (fp.random_elements(fr, rng, ()) for _ in range(3))
            rand_prod = fp.add(
                fr,
                compute_hp(curve, ha, all_witnesses[0].b_vec),
                compute_hp(curve, all_witnesses[-1].a_vec, hb),
            )
            hc = pedersen.commit_batched(
                curve, prover_key, jnp.stack([ha, hb, rand_prod]),
                jnp.stack([r1, r2, r3]))
            hcl = common.unstack_affine(hc)
            hiding_vecs = (ha, hb)
            hiding_rands = InputWitnessRandomness(r1, r2, r3)
            hiding_comms = ProofHidingCommitments(hcl[0], hcl[1], hcl[2])

        # Fiat-Shamir round 1 (reference mod.rs:752-761)
        challenges_sponge = sponge
        challenges_sponge.absorb_u64(prover_key.supported_num_elems)
        for inst in all_instances:
            inst.absorb_into(curve, challenges_sponge)
        if hiding_comms is not None:
            for c in (hiding_comms.comm_1, hiding_comms.comm_2, hiding_comms.comm_3):
                common.absorb_affine(challenges_sponge, curve, c)

        mu_ints = self._squeeze_mu_challenges(
            challenges_sponge, m, make_zk_enabled, fr)
        mu_m = fp.array_from_ints(fr, mu_ints)  # (m(+1), L)

        # t-vecs + commitments (reference mod.rs:288-388)
        t_vecs = self._compute_t_vecs(a_stack, b_stack, mu_m, hiding_vecs)
        if m > 1:
            t_lowhigh = jnp.concatenate([t_vecs[:m - 1], t_vecs[m:]], axis=0)
            t_comms = pedersen.commit_batched(curve, prover_key, t_lowhigh)
            low = Affine(t_comms.x[:m - 1], t_comms.y[:m - 1], t_comms.inf[:m - 1])
            high = Affine(t_comms.x[m - 1:], t_comms.y[m - 1:], t_comms.inf[m - 1:])
        else:
            low = wst.affine_zero(curve, (0,))
            high = wst.affine_zero(curve, (0,))
        proof = Proof(low, high, hiding_comms)

        # Fiat-Shamir round 2 (reference mod.rs:779-780)
        common.absorb_affine_list(challenges_sponge, curve, low)
        common.absorb_affine_list(challenges_sponge, curve, high)
        nu_ints = self._squeeze_nu_challenges(challenges_sponge, m, fr)
        nu_m = fp.array_from_ints(fr, nu_ints)  # (2m-1, L)
        cc_ints = [mu_ints[i] * nu_ints[i] % fr.modulus for i in range(m)]
        cc_m = fp.array_from_ints(fr, cc_ints)

        # combined instance (reference mod.rs:788-794)
        acc_instance = self._combined_instance(
            all_instances, proof, mu_m, nu_m, cc_m, make_zk_enabled)

        # combined witness (reference compute_combined_hp_openings, 535-607)
        hiding_a_addend = (
            fp.mul(fr, hiding_vecs[0], mu_m[m][None, :]) if make_zk_enabled else None)
        a_comb = poly_ops.weighted_sum(fr, a_stack, cc_m[:m])
        if hiding_a_addend is not None:
            a_comb = fp.add(fr, a_comb, hiding_a_addend)
        hiding_b_addend = (
            fp.mul(fr, hiding_vecs[1], mu_m[1][None, :]) if make_zk_enabled else None)
        b_comb = poly_ops.weighted_sum(fr, b_stack[::-1], nu_m[:m])
        if hiding_b_addend is not None:
            b_comb = fp.add(fr, b_comb, hiding_b_addend)

        randomness = None
        if make_zk_enabled:
            def rand_of(w, which):
                if w.randomness is None:
                    return common.fr_zero()
                return getattr(w.randomness, which)

            r1s = jnp.stack([rand_of(w, "rand_1") for w in all_witnesses])
            r2s = jnp.stack([rand_of(w, "rand_2") for w in all_witnesses])
            r3s = jnp.stack([rand_of(w, "rand_3") for w in all_witnesses])
            rand_1 = fp.add(fr, poly_ops.weighted_sum(fr, r1s, cc_m[:m]),
                            fp.mul(fr, hiding_rands.rand_1, mu_m[m]))
            rand_2 = fp.add(fr, poly_ops.weighted_sum(fr, r2s[::-1], nu_m[:m]),
                            fp.mul(fr, hiding_rands.rand_2, mu_m[1]))
            rand_3 = fp.mul(
                fr,
                fp.add(fr, poly_ops.weighted_sum(fr, r3s, mu_m[:m]),
                       fp.mul(fr, hiding_rands.rand_3, mu_m[m])),
                nu_m[m - 1])
            randomness = InputWitnessRandomness(rand_1, rand_2, rand_3)

        acc_witness = InputWitness(a_comb, b_comb, randomness)
        return InstanceWitnessPair(acc_instance, acc_witness), proof

    # -- verify -------------------------------------------------------------

    def verify(self, verifier_key: int, input_instances, old_accumulator_instances,
               new_accumulator_instance: InputInstance, proof: Proof,
               sponge: Optional[PoseidonSponge] = None) -> bool:
        curve, fr = self.curve, self.curve.fr
        sponge = sponge if sponge is not None else PoseidonSponge(curve.fq)

        input_instances = list(input_instances)
        old_accumulator_instances = list(old_accumulator_instances)
        num_all = len(input_instances) + len(old_accumulator_instances)
        make_zk = proof.hiding_comms is not None

        if num_all == 0:
            input_instances.append(InputInstance.zero(curve))
            num_all += 1
        if make_zk and num_all == 1:
            input_instances.append(InputInstance.zero(curve))
            num_all += 1
        m = num_all

        # proof structure (reference mod.rs:160-176)
        if proof.product_poly_comm_low.x.shape[0] != proof.product_poly_comm_high.x.shape[0]:
            return False
        if proof.product_poly_comm_low.x.shape[0] != m - 1:
            return False

        all_instances = input_instances + old_accumulator_instances
        challenges_sponge = sponge
        challenges_sponge.absorb_u64(verifier_key)
        for inst in all_instances:
            inst.absorb_into(curve, challenges_sponge)
        if make_zk:
            hc = proof.hiding_comms
            for c in (hc.comm_1, hc.comm_2, hc.comm_3):
                common.absorb_affine(challenges_sponge, curve, c)

        mu_ints = self._squeeze_mu_challenges(challenges_sponge, m, make_zk, fr)
        mu_m = fp.array_from_ints(fr, mu_ints)
        common.absorb_affine_list(challenges_sponge, curve, proof.product_poly_comm_low)
        common.absorb_affine_list(challenges_sponge, curve, proof.product_poly_comm_high)
        nu_ints = self._squeeze_nu_challenges(challenges_sponge, m, fr)
        nu_m = fp.array_from_ints(fr, nu_ints)
        cc_ints = [mu_ints[i] * nu_ints[i] % fr.modulus for i in range(m)]
        cc_m = fp.array_from_ints(fr, cc_ints)

        acc_instance = self._combined_instance(
            all_instances, proof, mu_m, nu_m, cc_m, make_zk)
        return acc_instance.eq(curve, new_accumulator_instance)

    # -- decide -------------------------------------------------------------

    def decide(self, decider_key: pedersen.PedersenKey,
               accumulator: InstanceWitnessPair, sponge=None) -> bool:
        curve = self.curve
        inst, wit = accumulator.instance, accumulator.witness
        product = compute_hp(curve, wit.a_vec, wit.b_vec)
        rands = None
        if wit.randomness is not None:
            rands = jnp.stack([wit.randomness.rand_1, wit.randomness.rand_2,
                               wit.randomness.rand_3])
        comms = pedersen.commit_batched(
            curve, decider_key, jnp.stack([wit.a_vec, wit.b_vec, product]), rands)
        got = common.unstack_affine(comms)
        test = InputInstance(got[0], got[1], got[2])
        return test.eq(curve, inst)
