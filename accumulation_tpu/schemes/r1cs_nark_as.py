"""ASForR1CSNark: accumulation scheme for the R1CS NARK, composed on hp_as.

TPU-native re-implementation of the reference scheme (BCLMS20 §8,
/root/reference/src/r1cs_nark_as/mod.rs).  Folds NARK proofs by:

  1. gamma-blinding each input's first-round commitments (mod.rs:220-286);
  2. building HP_AS inputs from (comm_a, comm_b, comm_prod) instances and
     (A z~, B z~) witnesses via sparse mat-vecs (mod.rs:289-363);
  3. running ASForHadamardProducts prove/verify on them plus the old
     accumulators' hp parts (mod.rs:852-863 / 990-997);
  4. folding r1cs_input / comm_a/b/c / blinded witness across inputs, old
     accumulators and optional zk randomness with beta challenges
     (mod.rs:423-658);
  5. decide = recommit M z~ + hp decide (mod.rs:1031-1112).

Three sponges forked from the base with the reference's exact domain strings
(mod.rs:112-125).  Note the same paper deviation as the reference: the full
r1cs_input is stored in the accumulator instance (mod.rs:46-50).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.accumulation import AccumulationScheme, InstanceWitnessPair, MakeZK
from ..core import errors
from ..constraints.r1cs import matrix_vec_mul
from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE
from ..ops import poly as poly_ops
from ..ops.sponge import (PoseidonSponge, AS_FOR_HP_DOMAIN,
                          AS_FOR_R1CS_NARK_DOMAIN, R1CS_NARK_DOMAIN)
from ..pc import pedersen
from . import common, hp_as
from .hp_as import ASForHadamardProducts
from .r1cs_nark import (FirstRoundMessage, IndexProverKey, IndexVerifierKey,
                        R1CSNark, SecondRoundMessage)
from ..constraints.r1cs import hash_matrices

CHALLENGE_SIZE = 128  # reference mod.rs:41
PROTOCOL_NAME = AS_FOR_R1CS_NARK_DOMAIN


@dataclass
class ProverKey:
    nark_pk: IndexProverKey
    as_matrices_hash: bytes


@dataclass
class VerifierKey:
    num_instance_variables: int
    num_constraints: int
    nark_matrices_hash: bytes
    as_matrices_hash: bytes

    @staticmethod
    def placeholder(input_len: int) -> "VerifierKey":
        """PCD-circuit-setup placeholder: only the public-input length must
        be correct, everything else may stay unknown (reference
        data_structures.rs:67-78)."""
        return VerifierKey(input_len, 0, b"\x00" * 32, b"\x00" * 32)


@dataclass
class InputInstance:
    """Reference data_structures.rs:106-143."""

    r1cs_input: jnp.ndarray  # (k, NLIMBS)
    first_round_message: FirstRoundMessage

    def absorb_into(self, curve: CurveSpec, sponge: PoseidonSponge):
        for x in fp.array_to_ints(curve.fr, self.r1cs_input):
            sponge.absorb_scalar(x)
        self.first_round_message.absorb_into(curve, sponge)

    @staticmethod
    def zero(curve: CurveSpec, input_len: int, make_zk: bool) -> "InputInstance":
        return InputInstance(
            common.fr_zeros((input_len,)),
            FirstRoundMessage.zero(curve, make_zk))


InputWitness = SecondRoundMessage  # reference data_structures.rs:149


@dataclass
class AccumulatorInstance:
    """Reference data_structures.rs:156-211."""

    r1cs_input: jnp.ndarray
    comm_a: Affine
    comm_b: Affine
    comm_c: Affine
    hp_instance: hp_as.InputInstance

    def absorb_into(self, curve: CurveSpec, sponge: PoseidonSponge):
        for x in fp.array_to_ints(curve.fr, self.r1cs_input):
            sponge.absorb_scalar(x)
        for c in (self.comm_a, self.comm_b, self.comm_c):
            common.absorb_affine(sponge, curve, c)
        self.hp_instance.absorb_into(curve, sponge)

    @staticmethod
    def placeholder(curve: CurveSpec, input_len: int) -> "AccumulatorInstance":
        """PCD-circuit-setup placeholder (reference
        data_structures.rs:174-183): zero input vector, identity commitments,
        zero hp instance."""
        z = wst.affine_zero(curve, ())
        return AccumulatorInstance(
            common.fr_zeros((input_len,)), z, z, z,
            hp_as.InputInstance.zero(curve))


@dataclass
class AccumulatorWitnessRandomness:
    sigma_a: jnp.ndarray
    sigma_b: jnp.ndarray
    sigma_c: jnp.ndarray


@dataclass
class AccumulatorWitness:
    """Reference data_structures.rs:218-243."""

    r1cs_blinded_witness: jnp.ndarray
    hp_witness: hp_as.InputWitness
    randomness: Optional[AccumulatorWitnessRandomness] = None


@dataclass
class ProofRandomness:
    r1cs_r_input: jnp.ndarray  # (k, NLIMBS)
    comm_r_a: Affine
    comm_r_b: Affine
    comm_r_c: Affine

    def absorb_into(self, curve: CurveSpec, sponge: PoseidonSponge):
        for x in fp.array_to_ints(curve.fr, self.r1cs_r_input):
            sponge.absorb_scalar(x)
        for c in (self.comm_r_a, self.comm_r_b, self.comm_r_c):
            common.absorb_affine(sponge, curve, c)


@dataclass
class Proof:
    """Reference data_structures.rs:250-325."""

    hp_proof: hp_as.Proof
    randomness: Optional[ProofRandomness] = None

    @staticmethod
    def placeholder(curve: CurveSpec, r1cs_input_len: int,
                    num_accumulators_and_inputs: int,
                    make_zk: bool) -> "Proof":
        """PCD-circuit-setup placeholder with the shapes a real proof would
        have for the given input count (reference
        data_structures.rs:259-325): m-1 low/high t-vec commitments, where m
        accounts for the zero-input default and the zk dummy input."""
        randomness = None
        if make_zk:
            z = wst.affine_zero(curve, ())
            randomness = ProofRandomness(
                common.fr_zeros((r1cs_input_len,)), z, z, z)
        num_inputs = max(num_accumulators_and_inputs, 1)
        if num_inputs == 1 and make_zk:
            num_inputs += 1
        zvec = wst.affine_zero(curve, (num_inputs - 1,))
        hiding = None
        if make_zk:
            z = wst.affine_zero(curve, ())
            hiding = hp_as.ProofHidingCommitments(z, z, z)
        hp_proof = hp_as.Proof(zvec, zvec, hiding)
        return Proof(hp_proof, randomness)


class ASForR1CSNark(AccumulationScheme):
    def __init__(self, curve: CurveSpec):
        self.curve = curve
        self.hp = ASForHadamardProducts(curve)
        self.nark = R1CSNark(curve)

    # -- keygen (reference mod.rs:687-711) -----------------------------------

    def setup(self, rng=None):
        return None

    def index(self, public_params, predicate_params, predicate_index):
        ipk, ivk = predicate_index
        as_matrices_hash = hash_matrices(PROTOCOL_NAME, ipk.a, ipk.b, ipk.c)
        pk = ProverKey(ipk, as_matrices_hash)
        vk = VerifierKey(
            ivk.index_info.num_instance_variables,
            ivk.index_info.num_constraints,
            ivk.index_info.matrices_hash,
            as_matrices_hash)
        return pk, vk, ivk

    # -- subroutines ---------------------------------------------------------

    def _blinded_commitments(self, nark_matrices_hash: bytes,
                             input_instances: List[InputInstance],
                             nark_sponge: PoseidonSponge):
        """Reference compute_blinded_commitments (mod.rs:220-286)."""
        curve, fr = self.curve, self.curve.fr
        out_a, out_b, out_c, out_prod = [], [], [], []
        for inst in input_instances:
            msg = inst.first_round_message
            ca, cb, cc, cprod = msg.comm_a, msg.comm_b, msg.comm_c, msg.comm_c
            if msg.randomness is not None:
                gamma_int = self.nark.compute_challenge(
                    nark_matrices_hash,
                    fp.array_to_ints(fr, inst.r1cs_input), msg,
                    nark_sponge.clone())
                gamma = fp.from_int(fr, gamma_int)
                gamma_sq = fp.mul(fr, gamma, gamma)
                r = msg.randomness
                pa = wst.proj_add(
                    curve, wst.from_affine(curve, ca),
                    wst.scalar_mul(curve, wst.from_affine(curve, r.comm_r_a), gamma))
                pb = wst.proj_add(
                    curve, wst.from_affine(curve, cb),
                    wst.scalar_mul(curve, wst.from_affine(curve, r.comm_r_b), gamma))
                pc = wst.proj_add(
                    curve, wst.from_affine(curve, cc),
                    wst.scalar_mul(curve, wst.from_affine(curve, r.comm_r_c), gamma))
                pprod = wst.proj_add(
                    curve, wst.from_affine(curve, cprod),
                    wst.proj_add(
                        curve,
                        wst.scalar_mul(curve, wst.from_affine(curve, r.comm_1), gamma),
                        wst.scalar_mul(curve, wst.from_affine(curve, r.comm_2), gamma_sq)))
                batch = wst.to_affine(curve, wst.Projective(
                    jnp.stack([pa.x, pb.x, pc.x, pprod.x]),
                    jnp.stack([pa.y, pb.y, pc.y, pprod.y]),
                    jnp.stack([pa.z, pb.z, pc.z, pprod.z])))
                pts = common.unstack_affine(batch)
                ca, cb, cc, cprod = pts[0], pts[1], pts[2], pts[3]
            out_a.append(ca)
            out_b.append(cb)
            out_c.append(cc)
            out_prod.append(cprod)
        return out_a, out_b, out_c, out_prod

    def _hp_input_instances(self, blinded_a, blinded_b, blinded_prod):
        return [
            hp_as.InputInstance(a, b, p)
            for a, b, p in zip(blinded_a, blinded_b, blinded_prod)
        ]

    def _hp_input_witnesses(self, prover_key: ProverKey,
                            input_instances, input_witnesses):
        """Reference compute_hp_input_witnesses (mod.rs:316-363)."""
        fr = self.curve.fr
        out = []
        for inst, wit in zip(input_instances, input_witnesses):
            a_vec = matrix_vec_mul(fr, prover_key.nark_pk.a_ell,
                                   inst.r1cs_input, wit.blinded_witness)
            b_vec = matrix_vec_mul(fr, prover_key.nark_pk.b_ell,
                                   inst.r1cs_input, wit.blinded_witness)
            rand = None
            if wit.randomness is not None:
                rand = hp_as.InputWitnessRandomness(
                    wit.randomness.sigma_a, wit.randomness.sigma_b,
                    wit.randomness.sigma_o)
            out.append(hp_as.InputWitness(a_vec, b_vec, rand))
        return out

    def _beta_challenges(self, num: int, as_matrices_hash: bytes,
                         accumulator_instances, input_instances,
                         proof_randomness, as_sponge: PoseidonSponge):
        """Reference compute_beta_challenges (mod.rs:423-448)."""
        curve, fr = self.curve, self.curve.fr
        sponge = as_sponge
        sponge.absorb_bytes(as_matrices_hash)
        for inst in accumulator_instances:
            inst.absorb_into(curve, sponge)
        for inst in input_instances:
            inst.absorb_into(curve, sponge)
        if proof_randomness is not None:
            proof_randomness.absorb_into(curve, sponge)
        ints = [1] + sponge.squeeze_nonnative_truncated(CHALLENGE_SIZE, num - 1)
        return ints, fp.array_from_ints(fr, ints)

    def _combine_instance_components(self, input_instances, blinded_a,
                                     blinded_b, blinded_c,
                                     accumulator_instances, betas,
                                     proof_randomness):
        """Reference compute_accumulator_instance_components (mod.rs:452-542).

        Order: old accumulators first, then inputs, then zk randomness."""
        curve, fr = self.curve, self.curve.fr
        r1cs_inputs = [a.r1cs_input for a in accumulator_instances] + \
                      [i.r1cs_input for i in input_instances]
        comm_a = [a.comm_a for a in accumulator_instances] + blinded_a
        comm_b = [a.comm_b for a in accumulator_instances] + blinded_b
        comm_c = [a.comm_c for a in accumulator_instances] + blinded_c
        if proof_randomness is not None:
            r1cs_inputs.append(proof_randomness.r1cs_r_input)
            comm_a.append(proof_randomness.comm_r_a)
            comm_b.append(proof_randomness.comm_r_b)
            comm_c.append(proof_randomness.comm_r_c)
        n = len(r1cs_inputs)
        combined_input = poly_ops.weighted_sum(
            fr, jnp.stack(r1cs_inputs), betas[:n])
        combined = []
        for comms in (comm_a, comm_b, comm_c):
            pts = wst.from_affine(curve, common.stack_affine(comms))
            combined.append(wst.lincomb(curve, pts, betas[:n]))
        batch = wst.to_affine(curve, wst.Projective(
            jnp.stack([c.x for c in combined]),
            jnp.stack([c.y for c in combined]),
            jnp.stack([c.z for c in combined])))
        pts = common.unstack_affine(batch)
        return combined_input, pts[0], pts[1], pts[2]

    def _combine_witness_components(self, input_witnesses,
                                    accumulator_witnesses, betas,
                                    prover_witness_randomness):
        """Reference compute_accumulator_witness_components (mod.rs:546-658)."""
        fr = self.curve.fr
        bws = [a.r1cs_blinded_witness for a in accumulator_witnesses] + \
              [w.blinded_witness for w in input_witnesses]
        if prover_witness_randomness is not None:
            r_witness, _, _, _ = prover_witness_randomness
            bws.append(r_witness)
        n = len(bws)
        combined_bw = poly_ops.weighted_sum(fr, jnp.stack(bws), betas[:n])

        randomness = None
        if prover_witness_randomness is not None:
            _, rand_1, rand_2, rand_3 = prover_witness_randomness

            def sigma_list(which):
                out = []
                for a in accumulator_witnesses:
                    out.append(getattr(a.randomness, which)
                               if a.randomness is not None else common.fr_zero())
                for w in input_witnesses:
                    out.append(getattr(w.randomness, "sigma_" + which[-1])
                               if w.randomness is not None else common.fr_zero())
                return out

            sa = sigma_list("sigma_a") + [rand_1]
            sb = sigma_list("sigma_b") + [rand_2]
            sc = sigma_list("sigma_c") + [rand_3]
            randomness = AccumulatorWitnessRandomness(
                poly_ops.weighted_sum(fr, jnp.stack(sa), betas[:n]),
                poly_ops.weighted_sum(fr, jnp.stack(sb), betas[:n]),
                poly_ops.weighted_sum(fr, jnp.stack(sc), betas[:n]))
        return combined_bw, randomness

    # -- prove (reference mod.rs:713-926) ------------------------------------

    def prove(self, prover_key: ProverKey, inputs, old_accumulators,
              make_zk: MakeZK = None, sponge: Optional[PoseidonSponge] = None):
        curve, fr = self.curve, self.curve.fr
        base_sponge = sponge if sponge is not None else PoseidonSponge(curve.fq)
        nark_sponge = base_sponge.fork(R1CS_NARK_DOMAIN)
        as_sponge = base_sponge.fork(PROTOCOL_NAME)
        hp_sponge = base_sponge.fork(AS_FOR_HP_DOMAIN)

        make_zk = make_zk or MakeZK.Disabled()
        make_zk_enabled, rng = make_zk.into_components()

        info = prover_key.nark_pk.index_info
        input_len = info.num_instance_variables
        witness_len = info.num_variables - input_len

        old_acc_instances = [p.instance for p in old_accumulators]
        old_acc_witnesses = [p.witness for p in old_accumulators]
        input_instances = [p.instance for p in inputs]
        input_witnesses = [p.witness for p in inputs]

        for inst in input_instances:
            if inst.r1cs_input.shape[0] != input_len:
                raise errors.MalformedInput("r1cs input length mismatch")
        for wit in input_witnesses:
            if wit.blinded_witness.shape[0] != witness_len:
                raise errors.MalformedInput("r1cs witness length mismatch")
        for inst in old_acc_instances:
            if inst.r1cs_input.shape[0] != input_len:
                raise errors.MalformedAccumulator("r1cs input length mismatch")
        for wit in old_acc_witnesses:
            if wit.r1cs_blinded_witness.shape[0] != witness_len:
                raise errors.MalformedAccumulator("r1cs witness length mismatch")

        if not input_instances and not old_acc_instances:
            input_instances.append(InputInstance.zero(curve, input_len, False))
            input_witnesses.append(SecondRoundMessage.zero(witness_len, False))

        if not make_zk_enabled:
            for wit in input_witnesses + [
                    w for w in old_acc_witnesses]:
                r = getattr(wit, "randomness", None)
                if r is not None:
                    raise errors.MissingRng(
                        "Accumulating inputs with hiding requires rng.")

        # zk proof randomness (reference mod.rs:366-420)
        proof_randomness = prover_witness_randomness = None
        if make_zk_enabled:
            assert rng is not None
            r_input = fp.random_elements(fr, rng, (input_len,))
            r_witness = fp.random_elements(fr, rng, (witness_len,))
            rand_123 = fp.random_elements(fr, rng, (3,))
            mats = (prover_key.nark_pk.a_ell, prover_key.nark_pk.b_ell,
                    prover_key.nark_pk.c_ell)
            vecs = jnp.stack([
                matrix_vec_mul(fr, m, r_input, r_witness) for m in mats])
            comms = pedersen.commit_batched(
                curve, prover_key.nark_pk.ck, vecs, rand_123)
            cl = common.unstack_affine(comms)
            proof_randomness = ProofRandomness(r_input, cl[0], cl[1], cl[2])
            prover_witness_randomness = (
                r_witness, rand_123[0], rand_123[1], rand_123[2])

        # steps 1-3: blinded comms -> HP inputs -> HP prove
        blinded_a, blinded_b, blinded_c, blinded_prod = \
            self._blinded_commitments(info.matrices_hash, input_instances,
                                      nark_sponge)
        hp_instances = self._hp_input_instances(blinded_a, blinded_b, blinded_prod)
        hp_witnesses = self._hp_input_witnesses(
            prover_key, input_instances, input_witnesses)
        hp_inputs = [InstanceWitnessPair(i, w)
                     for i, w in zip(hp_instances, hp_witnesses)]
        hp_old = [InstanceWitnessPair(a.hp_instance, w.hp_witness)
                  for a, w in zip(old_acc_instances, old_acc_witnesses)]
        hp_acc, hp_proof = self.hp.prove(
            prover_key.nark_pk.ck, hp_inputs, hp_old,
            MakeZK.Enabled(rng) if make_zk_enabled else MakeZK.Disabled(),
            sponge=hp_sponge)

        # step 5: beta challenges
        num_addends = (len(input_instances) + len(old_acc_instances)
                       + (1 if make_zk_enabled else 0))
        _, betas = self._beta_challenges(
            num_addends, prover_key.as_matrices_hash, old_acc_instances,
            input_instances, proof_randomness, as_sponge)

        # step 6: combined instance
        r1cs_input, comm_a, comm_b, comm_c = self._combine_instance_components(
            input_instances, blinded_a, blinded_b, blinded_c,
            old_acc_instances, betas, proof_randomness)
        acc_instance = AccumulatorInstance(
            r1cs_input, comm_a, comm_b, comm_c, hp_acc.instance)

        # step 7: combined witness
        blinded_witness, w_randomness = self._combine_witness_components(
            input_witnesses, old_acc_witnesses, betas,
            prover_witness_randomness)
        acc_witness = AccumulatorWitness(
            blinded_witness, hp_acc.witness, w_randomness)

        proof = Proof(hp_proof, proof_randomness)
        return InstanceWitnessPair(acc_instance, acc_witness), proof

    # -- verify (reference mod.rs:928-1029) ----------------------------------

    def verify(self, verifier_key: VerifierKey, input_instances,
               old_accumulator_instances,
               new_accumulator_instance: AccumulatorInstance, proof: Proof,
               sponge: Optional[PoseidonSponge] = None) -> bool:
        curve, fr = self.curve, self.curve.fr
        base_sponge = sponge if sponge is not None else PoseidonSponge(curve.fq)
        nark_sponge = base_sponge.fork(R1CS_NARK_DOMAIN)
        as_sponge = base_sponge.fork(PROTOCOL_NAME)
        hp_sponge = base_sponge.fork(AS_FOR_HP_DOMAIN)

        make_zk = proof.randomness is not None
        input_len = verifier_key.num_instance_variables

        input_instances = list(input_instances)
        old_acc_instances = list(old_accumulator_instances)
        for inst in input_instances + old_acc_instances:
            if inst.r1cs_input.shape[0] != input_len:
                return False

        if not input_instances and not old_acc_instances:
            input_instances.append(InputInstance.zero(curve, input_len, False))

        blinded_a, blinded_b, blinded_c, blinded_prod = \
            self._blinded_commitments(verifier_key.nark_matrices_hash,
                                      input_instances, nark_sponge)
        hp_instances = self._hp_input_instances(blinded_a, blinded_b, blinded_prod)
        hp_old = [a.hp_instance for a in old_acc_instances]
        hp_ok = self.hp.verify(
            verifier_key.num_constraints, hp_instances, hp_old,
            new_accumulator_instance.hp_instance, proof.hp_proof,
            sponge=hp_sponge)
        if not hp_ok:
            return False

        num_addends = (len(input_instances) + len(old_acc_instances)
                       + (1 if make_zk else 0))
        _, betas = self._beta_challenges(
            num_addends, verifier_key.as_matrices_hash, old_acc_instances,
            input_instances, proof.randomness, as_sponge)

        r1cs_input, comm_a, comm_b, comm_c = self._combine_instance_components(
            input_instances, blinded_a, blinded_b, blinded_c,
            old_acc_instances, betas, proof.randomness)

        ok = bool(np.asarray(fp.eq(
            r1cs_input, new_accumulator_instance.r1cs_input).all()))
        for got, want in ((comm_a, new_accumulator_instance.comm_a),
                          (comm_b, new_accumulator_instance.comm_b),
                          (comm_c, new_accumulator_instance.comm_c)):
            ok = ok and bool(np.asarray(wst.affine_eq(got, want)))
        return ok

    # -- decide (reference mod.rs:1031-1112) ---------------------------------

    def decide(self, decider_key: IndexVerifierKey,
               accumulator: InstanceWitnessPair, sponge=None) -> bool:
        curve, fr = self.curve, self.curve.fr
        inst, wit = accumulator.instance, accumulator.witness
        a_bw = matrix_vec_mul(fr, decider_key.a_ell, inst.r1cs_input,
                              wit.r1cs_blinded_witness)
        b_bw = matrix_vec_mul(fr, decider_key.b_ell, inst.r1cs_input,
                              wit.r1cs_blinded_witness)
        c_bw = matrix_vec_mul(fr, decider_key.c_ell, inst.r1cs_input,
                              wit.r1cs_blinded_witness)
        rands = None
        if wit.randomness is not None:
            rands = jnp.stack([wit.randomness.sigma_a, wit.randomness.sigma_b,
                               wit.randomness.sigma_c])
        comms = pedersen.commit_batched(
            curve, decider_key.ck, jnp.stack([a_bw, b_bw, c_bw]), rands)
        cl = common.unstack_affine(comms)
        ok = all(
            bool(np.asarray(wst.affine_eq(got, want)))
            for got, want in ((cl[0], inst.comm_a), (cl[1], inst.comm_b),
                              (cl[2], inst.comm_c)))
        if not ok:
            return False
        return self.hp.decide(
            decider_key.ck,
            InstanceWitnessPair(inst.hp_instance, wit.hp_witness))
