"""AtomicASForInnerProductArgPC: accumulation scheme for IPA-PC openings.

TPU-native re-implementation of the reference's flagship scheme (BCMS20 §7,
/root/reference/src/ipa_pc_as/mod.rs).  Atomic: witnesses are trivial.

Pipeline parity (reference mod.rs:555-676 / 678-818):
  1. succinct-check every input and old accumulator, collecting
     (check polynomial h_i, final commitment key U_i) (mod.rs:189-237);
  2. squeeze one 128-bit linear-combination challenge lambda_i per check from
     the AS-domain sponge, which absorbed the zk randomness (if any), each
     h_i's challenge bytes and each U_i (mod.rs:254-346);
  3. combined commitment = sum lambda_i U_i (+ zk randomizer terms);
  4. squeeze the new 184-bit evaluation point from a fresh AS-domain sponge
     absorbing the combined commitment, the zk linear polynomial and every
     (lambda_i, h_i) pair (mod.rs:349-388);
  5. prover materialises sum lambda_i h_i(X) (+ zk linear poly) and runs a
     full IPA open at the new point (mod.rs:424-472); verifier instead
     evaluates the combined h at the point (O(m log n)) and compares the
     claimed accumulator (mod.rs:786-815);
  6. decider = one full IPA check (mod.rs:820-848).

zk (MakeZK::Enabled): accumulate an extra random *linear* polynomial with
commitment randomness (mod.rs:164-187); the verifier recommits it under the
degree-1 key `ipa_ck_linear` (mod.rs:756-766).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.accumulation import (AtomicAccumulationScheme, InstanceWitnessPair,
                                 MakeZK)
from ..core import errors
from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE
from ..ops import poly as poly_ops
from ..ops.sponge import (PoseidonSponge, domain_sponge, AS_FOR_IPA_PC_DOMAIN,
                          IPA_PC_DOMAIN)
from ..pc import ipa_pc
from . import common

LINEAR_COMBINATION_CHALLENGE_SIZE = 128  # reference mod.rs:42
CHALLENGE_POINT_SIZE = 184               # reference mod.rs:43


@dataclass
class InputInstance:
    """An IPA-PC opening claim (reference data_structures.rs:55-68)."""

    ipa_commitment: Affine
    point: jnp.ndarray       # (NLIMBS,)
    evaluation: jnp.ndarray  # (NLIMBS,)
    ipa_proof: ipa_pc.Proof


@dataclass
class Randomness:
    """The zk proof (reference data_structures.rs:76-86)."""

    random_linear_polynomial: jnp.ndarray  # (2, NLIMBS)
    random_linear_polynomial_commitment: Affine
    commitment_randomness: jnp.ndarray  # (NLIMBS,)


Proof = Optional[Randomness]


class PredicateIndex(NamedTuple):
    supported_degree_bound: int
    supported_hiding_bound: int


class ProverKey(NamedTuple):
    ipa_ck: ipa_pc.CommitterKey
    verifier_key: "VerifierKey"


class VerifierKey(NamedTuple):
    ipa_svk: ipa_pc.SuccinctVerifierKey
    ipa_ck_linear: ipa_pc.CommitterKey
    default_proof: ipa_pc.Proof


class AtomicASForInnerProductArgPC(AtomicAccumulationScheme):
    def __init__(self, curve: CurveSpec):
        self.curve = curve

    # -- keygen (reference mod.rs:502-553) ----------------------------------

    def setup(self, rng=None):
        return None

    def index(self, public_params, predicate_params: ipa_pc.UniversalParams,
              predicate_index: PredicateIndex):
        curve = self.curve
        # both bounds reach trim, as in the reference (mod.rs:507-513); the
        # linear key is trimmed with hiding bound 0 (mod.rs:536-537)
        ipa_ck = ipa_pc.trim(predicate_params,
                             predicate_index.supported_degree_bound,
                             predicate_index.supported_hiding_bound)
        # default proof for the zero polynomial (used when accumulating with
        # no inputs; reference mod.rs:515-534)
        default_proof = ipa_pc.open(
            curve, ipa_ck, jnp.zeros((1, NLIMBS), DTYPE),
            wst.affine_zero(curve, ()), jnp.zeros((NLIMBS,), DTYPE))
        ipa_ck_linear = ipa_pc.trim(predicate_params, 1, 0)
        vk = VerifierKey(ipa_pc.svk_of(ipa_ck), ipa_ck_linear, default_proof)
        pk = ProverKey(ipa_ck, vk)
        dk = ipa_ck
        return pk, vk, dk

    # -- shared subroutines --------------------------------------------------

    def _default_input(self, vk: VerifierKey) -> InputInstance:
        return InputInstance(
            wst.affine_zero(self.curve, ()),
            jnp.zeros((NLIMBS,), DTYPE), jnp.zeros((NLIMBS,), DTYPE),
            vk.default_proof)

    def _succinct_check_all(self, svk, inputs: List[InputInstance],
                            accumulators: List[InputInstance]):
        """Reference succinct_check_inputs_and_accumulators (mod.rs:225-237)."""
        out = []
        for inst, is_acc in ([(i, False) for i in inputs]
                             + [(a, True) for a in accumulators]):
            # typed structure error where Rust's type system forbids the
            # state at compile time (ref mod.rs:114-134 checks only the
            # degree bound; a missing proof cannot be expressed there)
            if inst.ipa_proof is None:
                raise (errors.MalformedAccumulator if is_acc
                       else errors.MalformedInput)(
                    "Instance is missing its IPA opening proof.")
            res = ipa_pc.succinct_check(
                self.curve, svk, inst.ipa_commitment, inst.point,
                inst.evaluation, inst.ipa_proof)
            if res is None:
                raise (errors.MalformedAccumulator if is_acc
                       else errors.MalformedInput)(
                    "Succinct check failed.")
            out.append(res)
        return out

    def _absorb_check_poly(self, sponge: PoseidonSponge,
                           check_poly: ipa_pc.SuccinctCheckPolynomial):
        """Reference absorb_succinct_check_polynomial_into_sponge
        (mod.rs:240-250): each challenge as 32 canonical LE bytes."""
        fr = self.curve.fr
        for c in fp.array_to_ints(fr, check_poly.challenges):
            sponge.absorb_scalar(c)

    def _combine(self, svk, succinct_checks, proof: Proof,
                 as_sponge: PoseidonSponge):
        """Reference combine_succinct_check_polynomials_and_commitments
        (mod.rs:254-346).  Returns (combined_commitment (Affine),
        randomized_combined_commitment (Affine), [(lambda_int, check_poly)])."""
        curve, fr = self.curve, self.curve.fr
        lc_sponge = as_sponge
        if proof is not None:
            coeffs = fp.array_to_ints(fr, proof.random_linear_polynomial)
            lc_sponge.absorb_scalar(coeffs[0])
            lc_sponge.absorb_scalar(coeffs[1])
            common.absorb_affine(
                lc_sponge, curve, proof.random_linear_polynomial_commitment)
        for check_poly, comm_key in succinct_checks:
            self._absorb_check_poly(lc_sponge, check_poly)
            common.absorb_affine(lc_sponge, curve, comm_key)

        lam_ints = lc_sponge.squeeze_nonnative_truncated(
            LINEAR_COMBINATION_CHALLENGE_SIZE, len(succinct_checks))

        if succinct_checks:
            lams = fp.array_from_ints(fr, lam_ints)
            comm_keys = common.stack_affine([ck for _, ck in succinct_checks])
            combined = wst.lincomb(curve, wst.from_affine(curve, comm_keys), lams)
        else:
            combined = wst.projective_zero(curve, ())
        if proof is not None:
            combined = wst.proj_add(
                curve, combined,
                wst.from_affine(curve, proof.random_linear_polynomial_commitment))
            randomized = wst.proj_add(
                curve, combined,
                wst.scalar_mul(curve, wst.from_affine(curve, svk.s),
                               proof.commitment_randomness))
        else:
            randomized = combined
        both = wst.to_affine(curve, wst.Projective(
            jnp.stack([combined.x, randomized.x]),
            jnp.stack([combined.y, randomized.y]),
            jnp.stack([combined.z, randomized.z])))
        combined_aff = Affine(both.x[0], both.y[0], both.inf[0])
        randomized_aff = Affine(both.x[1], both.y[1], both.inf[1])
        addends = [(lam_ints[i], succinct_checks[i][0])
                   for i in range(len(succinct_checks))]
        return combined_aff, randomized_aff, addends

    def _new_challenge(self, as_sponge: PoseidonSponge, combined_commitment,
                       addends, random_linear_poly) -> int:
        """Reference compute_new_challenge (mod.rs:349-388)."""
        curve, fr = self.curve, self.curve.fr
        sponge = as_sponge
        common.absorb_affine(sponge, curve, combined_commitment)
        if random_linear_poly is not None:
            coeffs = fp.array_to_ints(fr, random_linear_poly)
            sponge.absorb_bytes(
                coeffs[0].to_bytes(32, "little") + coeffs[1].to_bytes(32, "little"))
        for lam_int, check_poly in addends:
            sponge.absorb_bytes(lam_int.to_bytes(
                (LINEAR_COMBINATION_CHALLENGE_SIZE + 7) // 8, "little"))
            self._absorb_check_poly(sponge, check_poly)
        return sponge.squeeze_nonnative_truncated(CHALLENGE_POINT_SIZE)[0]

    def _combine_check_polys(self, addends, n_coeffs: int,
                             random_linear_poly) -> jnp.ndarray:
        """sum_i lambda_i h_i(X) materialised to (n_coeffs, L)
        (reference combine_succinct_check_polynomials, mod.rs:391-404)."""
        fr = self.curve.fr
        total = jnp.zeros((n_coeffs, NLIMBS), DTYPE)
        if random_linear_poly is not None:
            total = total.at[:2].set(random_linear_poly)
        for lam_int, check_poly in addends:
            coeffs = check_poly.compute_coeffs(fr)
            lam = fp.from_int(fr, lam_int)
            scaled = fp.mul(fr, coeffs, lam[None, :])
            total = total.at[:coeffs.shape[0]].set(
                fp.add(fr, total[:coeffs.shape[0]], scaled))
        return total

    def _evaluate_combined(self, addends, point, random_linear_poly):
        """O(m log n) evaluation (reference mod.rs:407-421)."""
        fr = self.curve.fr
        acc = jnp.zeros((NLIMBS,), DTYPE)
        if random_linear_poly is not None:
            acc = poly_ops.evaluate(fr, random_linear_poly, point)
        for lam_int, check_poly in addends:
            lam = fp.from_int(fr, lam_int)
            acc = fp.add(fr, acc, fp.mul(fr, check_poly.evaluate(fr, point), lam))
        return acc

    # -- prove (reference mod.rs:555-676) ------------------------------------

    def prove(self, prover_key: ProverKey, inputs, old_accumulators,
              make_zk: MakeZK = None, sponge=None):
        if sponge is not None:
            raise NotImplementedError(
                "ASForIpaPC drives its own domain-separated sponges "
                "(reference mod.rs:566-570)")
        curve, fr = self.curve, self.curve.fr
        make_zk = make_zk or MakeZK.Disabled()
        make_zk_enabled, rng = make_zk.into_components()

        input_instances = [p.instance for p in inputs]
        old_instances = [p.instance for p in old_accumulators]

        # typed structure errors up front (ref mod.rs:114-134 analog; a
        # missing proof is unrepresentable in the Rust types)
        for inst in input_instances:
            if inst.ipa_proof is None:
                raise errors.MalformedInput(
                    "Input instance is missing its IPA opening proof.")
        for inst in old_instances:
            if inst.ipa_proof is None:
                raise errors.MalformedAccumulator(
                    "Accumulator instance is missing its IPA opening proof.")

        if not make_zk_enabled:
            for inst in input_instances + old_instances:
                if inst.ipa_proof.hiding_comm is not None or inst.ipa_proof.rand is not None:
                    raise errors.MissingRng(
                        "Accumulating inputs with hiding requires rng.")

        if not make_zk_enabled and not input_instances and not old_instances:
            input_instances.append(
                self._default_input(prover_key.verifier_key))

        proof: Proof = None
        if make_zk_enabled:
            assert rng is not None
            lin = fp.random_elements(fr, rng, (2,))
            lin_comm = ipa_pc.commit(
                curve, prover_key.verifier_key.ipa_ck_linear, lin)
            comm_rand = fp.random_elements(fr, rng, ())
            proof = Randomness(lin, lin_comm, comm_rand)

        svk = prover_key.verifier_key.ipa_svk
        succinct_checks = self._succinct_check_all(
            svk, input_instances, old_instances)

        as_sponge = domain_sponge(curve.fq, AS_FOR_IPA_PC_DOMAIN)
        combined_comm, randomized_comm, addends = self._combine(
            svk, succinct_checks, proof, as_sponge)

        n = prover_key.ipa_ck.comm_key.x.shape[0]
        combined_poly = self._combine_check_polys(
            addends, n,
            proof.random_linear_polynomial if proof is not None else None)

        challenge_int = self._new_challenge(
            domain_sponge(curve.fq, AS_FOR_IPA_PC_DOMAIN), combined_comm,
            addends,
            proof.random_linear_polynomial if proof is not None else None)
        challenge = fp.from_int(fr, challenge_int)

        # full IPA open on the combined polynomial (reference mod.rs:424-472)
        evaluation = poly_ops.evaluate(fr, combined_poly, challenge)
        ipa_proof = ipa_pc.open(
            curve, prover_key.ipa_ck, combined_poly, randomized_comm,
            challenge,
            rand=(proof.commitment_randomness if proof is not None else None),
            hiding=make_zk_enabled, rng=rng)

        acc_instance = InputInstance(
            ipa_commitment=randomized_comm,
            point=challenge,
            evaluation=evaluation,
            ipa_proof=ipa_proof)
        return InstanceWitnessPair(acc_instance, None), proof

    # -- verify (reference mod.rs:678-818) -----------------------------------

    def verify(self, verifier_key: VerifierKey, input_instances,
               old_accumulator_instances, new_accumulator_instance: InputInstance,
               proof: Proof, sponge=None) -> bool:
        if sponge is not None:
            raise NotImplementedError
        curve, fr = self.curve, self.curve.fr

        input_instances = list(input_instances)
        old_instances = list(old_accumulator_instances)
        make_zk = proof is not None
        if proof is not None and proof.random_linear_polynomial.shape[0] > 2:
            return False

        if not make_zk and not input_instances and not old_instances:
            input_instances.append(self._default_input(verifier_key))

        try:
            succinct_checks = self._succinct_check_all(
                verifier_key.ipa_svk, input_instances, old_instances)
        except errors.ASError:
            return False

        # zk linear polynomial commitment check (reference mod.rs:756-766)
        if proof is not None:
            expect = ipa_pc.commit(
                curve, verifier_key.ipa_ck_linear,
                proof.random_linear_polynomial)
            if not bool(np.asarray(wst.affine_eq(
                    expect, proof.random_linear_polynomial_commitment))):
                return False

        as_sponge = domain_sponge(curve.fq, AS_FOR_IPA_PC_DOMAIN)
        combined_comm, randomized_comm, addends = self._combine(
            verifier_key.ipa_svk, succinct_checks, proof, as_sponge)

        if not bool(np.asarray(wst.affine_eq(
                randomized_comm, new_accumulator_instance.ipa_commitment))):
            return False

        challenge_int = self._new_challenge(
            domain_sponge(curve.fq, AS_FOR_IPA_PC_DOMAIN), combined_comm,
            addends,
            proof.random_linear_polynomial if proof is not None else None)
        if challenge_int != fp.to_int(fr, new_accumulator_instance.point):
            return False

        eval_combined = self._evaluate_combined(
            addends, new_accumulator_instance.point,
            proof.random_linear_polynomial if proof is not None else None)
        return bool(np.asarray(fp.eq(
            eval_combined, new_accumulator_instance.evaluation)))

    # -- decide (reference mod.rs:820-848) -----------------------------------

    def decide(self, decider_key: ipa_pc.CommitterKey,
               accumulator: InstanceWitnessPair, sponge=None) -> bool:
        inst = accumulator.instance
        return ipa_pc.check(
            self.curve, decider_key, inst.ipa_commitment, inst.point,
            inst.evaluation, inst.ipa_proof)
