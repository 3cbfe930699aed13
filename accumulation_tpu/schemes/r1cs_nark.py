"""A sigma-protocol NARK for R1CS (layer L5, embedded NARK).

TPU-native re-implementation of the reference's embedded NARK (BCLMS20 §8,
/root/reference/src/r1cs_nark_as/r1cs_nark/mod.rs).  The prover commits to
z_A = A z, z_B = B z, z_C = C z under Pedersen (plus zk blinders and cross
terms), derives the gamma challenge by Fiat-Shamir over the matrices hash /
input / first message, and responds with the (blinded) witness.

Hot paths are device-side: three ELL sparse mat-vecs, batched Pedersen
commits (up to 8 MSMs of length num_constraints), vectorised blinding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..constraints import r1cs
from ..constraints.r1cs import (ConstraintSystem, SparseMatrix, hash_matrices,
                                matrix_vec_mul)
from ..core import errors
from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE
from ..ops.sponge import PoseidonSponge, R1CS_NARK_DOMAIN
from ..pc import pedersen
from . import common

CHALLENGE_SIZE = 128
PROTOCOL_NAME = R1CS_NARK_DOMAIN  # b"R1CS-NARK-2020"


@dataclass
class IndexInfo:
    """Reference r1cs_nark data_structures.rs:17-29."""

    num_variables: int
    num_constraints: int
    num_instance_variables: int
    matrices_hash: bytes


@dataclass
class IndexProverKey:
    """= IndexVerifierKey (reference data_structures.rs:33-51)."""

    index_info: IndexInfo
    a: SparseMatrix
    b: SparseMatrix
    c: SparseMatrix
    a_ell: tuple
    b_ell: tuple
    c_ell: tuple
    ck: pedersen.PedersenKey


IndexVerifierKey = IndexProverKey


@dataclass
class FirstRoundMessageRandomness:
    comm_r_a: Affine
    comm_r_b: Affine
    comm_r_c: Affine
    comm_1: Affine
    comm_2: Affine


@dataclass
class FirstRoundMessage:
    """Reference data_structures.rs:55-148."""

    comm_a: Affine
    comm_b: Affine
    comm_c: Affine
    randomness: Optional[FirstRoundMessageRandomness] = None

    def absorb_into(self, curve: CurveSpec, sponge: PoseidonSponge):
        for c in (self.comm_a, self.comm_b, self.comm_c):
            common.absorb_affine(sponge, curve, c)
        if self.randomness is not None:
            r = self.randomness
            for c in (r.comm_r_a, r.comm_r_b, r.comm_r_c, r.comm_1, r.comm_2):
                common.absorb_affine(sponge, curve, c)

    @staticmethod
    def zero(curve: CurveSpec, make_zk: bool) -> "FirstRoundMessage":
        z = wst.affine_zero(curve, ())
        rand = (FirstRoundMessageRandomness(z, z, z, z, z) if make_zk else None)
        return FirstRoundMessage(z, z, z, rand)


@dataclass
class SecondRoundMessageRandomness:
    sigma_a: jnp.ndarray
    sigma_b: jnp.ndarray
    sigma_c: jnp.ndarray
    sigma_o: jnp.ndarray


@dataclass
class SecondRoundMessage:
    """Reference data_structures.rs:152-195."""

    blinded_witness: jnp.ndarray  # (w, NLIMBS)
    randomness: Optional[SecondRoundMessageRandomness] = None

    @staticmethod
    def zero(witness_len: int, make_zk: bool) -> "SecondRoundMessage":
        z = jnp.zeros((NLIMBS,), DTYPE)
        rand = (SecondRoundMessageRandomness(z, z, z, z) if make_zk else None)
        return SecondRoundMessage(common.fr_zeros((witness_len,)), rand)


@dataclass
class Proof:
    first_msg: FirstRoundMessage
    second_msg: SecondRoundMessage


class R1CSNark:
    def __init__(self, curve: CurveSpec):
        self.curve = curve

    # -- challenge (reference mod.rs:49-72) ----------------------------------

    def compute_challenge(self, matrices_hash: bytes, input_ints: List[int],
                          msg: FirstRoundMessage, sponge: PoseidonSponge) -> int:
        sponge.absorb_bytes(matrices_hash)
        input_bytes = b"".join(x.to_bytes(32, "little") for x in input_ints)
        sponge.absorb_bytes(input_bytes)
        msg.absorb_into(self.curve, sponge)
        return sponge.squeeze_nonnative_truncated(CHALLENGE_SIZE)[0]

    # -- index (reference mod.rs:78-124) -------------------------------------

    def index(self, circuit) -> IndexProverKey:
        cs = ConstraintSystem(self.curve.fr, r1cs.SETUP)
        circuit.generate_constraints(cs)
        cs.finalize()
        a, b, c = cs.to_matrices()
        matrices_hash = hash_matrices(PROTOCOL_NAME, a, b, c)
        pp = pedersen.setup(self.curve, cs.num_constraints)
        ck = pedersen.trim(pp, cs.num_constraints)
        nv = cs.num_variables
        info = IndexInfo(nv, cs.num_constraints, cs.num_instance_variables,
                         matrices_hash)
        ipk = IndexProverKey(
            info, a, b, c, a.to_ell(nv), b.to_ell(nv), c.to_ell(nv), ck)
        return ipk, ipk

    # -- prove (reference mod.rs:127-332) ------------------------------------

    def prove(self, ipk: IndexProverKey, circuit, make_zk: bool = False,
              sponge: Optional[PoseidonSponge] = None, rng=None) -> Proof:
        curve, fr = self.curve, self.curve.fr
        cs = ConstraintSystem(fr, r1cs.PROVE)
        circuit.generate_constraints(cs)
        cs.finalize()
        assert cs.num_variables == ipk.index_info.num_variables
        assert cs.num_constraints == ipk.index_info.num_constraints

        input_ints = cs.instance_assignment
        input_arr = fp.array_from_ints(fr, input_ints)
        witness_arr = fp.array_from_ints(fr, cs.witness_assignment)
        num_wit = len(cs.witness_assignment)

        z_a = matrix_vec_mul(fr, ipk.a_ell, input_arr, witness_arr)
        z_b = matrix_vec_mul(fr, ipk.b_ell, input_arr, witness_arr)
        z_c = matrix_vec_mul(fr, ipk.c_ell, input_arr, witness_arr)

        if make_zk:
            assert rng is not None
            r = fp.random_elements(fr, rng, (num_wit,))
            zeros_input = common.fr_zeros((len(input_ints),))
            r_a = matrix_vec_mul(fr, ipk.a_ell, zeros_input, r)
            r_b = matrix_vec_mul(fr, ipk.b_ell, zeros_input, r)
            r_c = matrix_vec_mul(fr, ipk.c_ell, zeros_input, r)
            blinders = fp.random_elements(fr, rng, (8,))
            (a_bl, b_bl, c_bl, ra_bl, rb_bl, rc_bl, bl1, bl2) = (
                blinders[i] for i in range(8))
            cross = fp.add(fr, fp.mul(fr, z_a, r_b), fp.mul(fr, z_b, r_a))
            r_ab = fp.mul(fr, r_a, r_b)
            comms = pedersen.commit_batched(
                curve, ipk.ck,
                jnp.stack([z_a, z_b, z_c, r_a, r_b, r_c, cross, r_ab]),
                blinders)
            cl = common.unstack_affine(comms)
            first_rand = FirstRoundMessageRandomness(cl[3], cl[4], cl[5],
                                                     cl[6], cl[7])
            first_msg = FirstRoundMessage(cl[0], cl[1], cl[2], first_rand)
        else:
            comms = pedersen.commit_batched(
                curve, ipk.ck, jnp.stack([z_a, z_b, z_c]))
            cl = common.unstack_affine(comms)
            first_msg = FirstRoundMessage(cl[0], cl[1], cl[2])
            a_bl = b_bl = c_bl = None

        gamma_int = self.compute_challenge(
            ipk.index_info.matrices_hash, input_ints, first_msg,
            sponge if sponge is not None else PoseidonSponge(curve.fq))

        blinded_witness = witness_arr
        second_rand = None
        if make_zk:
            gamma = fp.from_int(fr, gamma_int)
            blinded_witness = fp.add(
                fr, witness_arr, fp.mul(fr, r, gamma[None, :]))
            gamma_sq = fp.mul(fr, gamma, gamma)
            second_rand = SecondRoundMessageRandomness(
                sigma_a=fp.add(fr, a_bl, fp.mul(fr, gamma, ra_bl)),
                sigma_b=fp.add(fr, b_bl, fp.mul(fr, gamma, rb_bl)),
                sigma_c=fp.add(fr, c_bl, fp.mul(fr, gamma, rc_bl)),
                sigma_o=fp.add(fr, c_bl, fp.add(
                    fr, fp.mul(fr, gamma, bl1), fp.mul(fr, gamma_sq, bl2))),
            )
        second_msg = SecondRoundMessage(blinded_witness, second_rand)
        return Proof(first_msg, second_msg)

    # -- verify (reference mod.rs:335-419) -----------------------------------

    def verify(self, ivk: IndexVerifierKey, input_ints: List[int],
               proof: Proof, sponge: Optional[PoseidonSponge] = None) -> bool:
        curve, fr = self.curve, self.curve.fr
        if (proof.first_msg.randomness is not None) != \
                (proof.second_msg.randomness is not None):
            return False

        gamma_int = self.compute_challenge(
            ivk.index_info.matrices_hash, input_ints, proof.first_msg,
            sponge if sponge is not None else PoseidonSponge(curve.fq))
        gamma = fp.from_int(fr, gamma_int)

        input_arr = fp.array_from_ints(fr, input_ints)
        bw = proof.second_msg.blinded_witness
        a_bw = matrix_vec_mul(fr, ivk.a_ell, input_arr, bw)
        b_bw = matrix_vec_mul(fr, ivk.b_ell, input_arr, bw)
        c_bw = matrix_vec_mul(fr, ivk.c_ell, input_arr, bw)

        comm_a = wst.from_affine(curve, proof.first_msg.comm_a)
        comm_b = wst.from_affine(curve, proof.first_msg.comm_b)
        comm_c = wst.from_affine(curve, proof.first_msg.comm_c)
        if proof.first_msg.randomness is not None:
            fr_rand = proof.first_msg.randomness
            comm_a = wst.proj_add(curve, comm_a, wst.scalar_mul(
                curve, wst.from_affine(curve, fr_rand.comm_r_a), gamma))
            comm_b = wst.proj_add(curve, comm_b, wst.scalar_mul(
                curve, wst.from_affine(curve, fr_rand.comm_r_b), gamma))
            comm_c = wst.proj_add(curve, comm_c, wst.scalar_mul(
                curve, wst.from_affine(curve, fr_rand.comm_r_c), gamma))

        s_rand = proof.second_msg.randomness
        recon = pedersen.commit_batched(
            curve, ivk.ck, jnp.stack([a_bw, b_bw, c_bw]),
            jnp.stack([s_rand.sigma_a, s_rand.sigma_b, s_rand.sigma_c])
            if s_rand is not None else None)
        rl = common.unstack_affine(recon)
        ok = all(
            bool(np.asarray(wst.proj_eq(
                curve, comm, wst.from_affine(curve, got))))
            for comm, got in ((comm_a, rl[0]), (comm_b, rl[1]), (comm_c, rl[2])))

        had_prod = fp.mul(fr, a_bw, b_bw)
        recon_had = pedersen.commit(
            curve, ivk.ck, had_prod,
            s_rand.sigma_o if s_rand is not None else None)
        had_comm = wst.from_affine(curve, proof.first_msg.comm_c)
        if proof.first_msg.randomness is not None:
            fr_rand = proof.first_msg.randomness
            gamma_sq = fp.mul(fr, gamma, gamma)
            had_comm = wst.proj_add(curve, had_comm, wst.scalar_mul(
                curve, wst.from_affine(curve, fr_rand.comm_1), gamma))
            had_comm = wst.proj_add(curve, had_comm, wst.scalar_mul(
                curve, wst.from_affine(curve, fr_rand.comm_2), gamma_sq))
        ok = ok and bool(np.asarray(wst.proj_eq(
            curve, had_comm, wst.from_affine(curve, recon_had))))
        return ok
