"""ASForTrivialPC: accumulation scheme for trivial-PC opening claims.

TPU-native re-implementation of the reference scheme (BCLMS20 §A,
/root/reference/src/trivial_pc_as/mod.rs).  Behavioural parity point by point:

  * witness polynomials w_i = (p_i - v_i)/(X - z_i) committed per input
    (reference mod.rs:181-222) — here one vmapped synthetic division and one
    batched Pedersen MSM;
  * two sponges forked from the base: challenge-point sponge absorbs the
    supported degree, every (instance, witness commitment) pair, and squeezes
    a 184-bit point (mod.rs:371-389); the linear-combination sponge absorbs
    the (CHALLENGE_POINT_SIZE/8)-byte point then every (eval, witness_eval)
    pair and squeezes 2n 126-bit challenges (mod.rs:390-429);
  * the new accumulator claims the combined polynomial's evaluation at the
    challenge point (mod.rs:431-467);
  * verify re-derives everything and additionally checks the per-input
    identity p_i(c) - v_i = w_i(c) (c - z_i) (mod.rs:522-608);
  * decide is a TrivialPC check of the stored polynomial (mod.rs:611-632).

Zero-input proves fall back to a zero default input (mod.rs:326-342); the
scheme has no zk path (MakeZK ignored), like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.accumulation import AccumulationScheme, InstanceWitnessPair, MakeZK
from ..core import errors
from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS
from ..ops import poly as poly_ops
from ..ops.sponge import PoseidonSponge
from ..pc import trivial_pc
from . import common

LINEAR_COMBINATION_CHALLENGE_SIZE = 126  # reference mod.rs:31
CHALLENGE_POINT_SIZE = 184               # reference mod.rs:32


@dataclass
class InputInstance:
    """Reference trivial_pc_as InputInstance (data_structures.rs:13-56)."""

    commitment: Affine  # shape ()
    point: jnp.ndarray  # (NLIMBS,) Fr Montgomery
    eval: jnp.ndarray   # (NLIMBS,)

    def absorb_into(self, curve: CurveSpec, sponge: PoseidonSponge):
        common.absorb_affine(sponge, curve, self.commitment)
        sponge.absorb_scalar(fp.to_int(curve.fr, self.point))
        sponge.absorb_scalar(fp.to_int(curve.fr, self.eval))

    @staticmethod
    def zero(curve: CurveSpec) -> "InputInstance":
        return InputInstance(
            wst.affine_zero(curve, ()), common.fr_zero(), common.fr_zero()
        )


# The witness is the polynomial itself: a (D, NLIMBS) coefficient tensor.


@dataclass
class SingleProof:
    """Reference SingleProof (data_structures.rs:63-73)."""

    witness_commitment: Affine
    witness_eval: jnp.ndarray
    eval: jnp.ndarray


Proof = List[SingleProof]


class ASForTrivialPC(AccumulationScheme):
    def __init__(self, curve: CurveSpec):
        self.curve = curve

    # -- keygen -------------------------------------------------------------

    def setup(self, rng=None):
        return None

    def index(self, public_params, predicate_params, predicate_index: int):
        ck = trivial_pc.trim(predicate_params, predicate_index)
        return ck, predicate_index, ck

    # -- helpers ------------------------------------------------------------

    def _pad(self, coeffs, d):
        cur = coeffs.shape[0]
        if cur == d:
            return coeffs
        assert cur < d + 1
        return jnp.concatenate(
            [coeffs, common.fr_zeros((d - cur,))], axis=0
        )

    # -- prove --------------------------------------------------------------

    def prove(self, prover_key: trivial_pc.TrivialPCKey, inputs, old_accumulators,
              make_zk: MakeZK = None, sponge: Optional[PoseidonSponge] = None):
        curve = self.curve
        fr = curve.fr
        sponge = sponge if sponge is not None else PoseidonSponge(curve.fq)
        d = prover_key.supported_degree + 1  # padded coefficient count

        inputs = list(inputs)
        accumulators = list(old_accumulators)
        if not inputs and not accumulators:
            inputs = [InstanceWitnessPair(
                InputInstance.zero(curve), common.fr_zeros((d,)))]

        all_pairs = inputs + accumulators
        instances = [p.instance for p in all_pairs]
        witnesses = [self._pad(p.witness, d) for p in all_pairs]
        for w in witnesses:
            if w.shape[0] > d:
                raise errors.MalformedInput("witness degree exceeds prover key")
        n = len(all_pairs)

        polys = jnp.stack(witnesses)                      # (n, D, L)
        points = jnp.stack([i.point for i in instances])  # (n, L)
        evals = jnp.stack([i.eval for i in instances])    # (n, L)

        # witness polynomials w_i = (p_i - v_i)/(X - z_i)  (reference 181-222)
        numer = polys.at[:, 0, :].set(fp.sub(fr, polys[:, 0, :], evals))
        wpolys, _ = jax.vmap(lambda c, z: poly_ops.divide_by_linear(fr, c, z))(
            numer, points)
        wcomms = trivial_pc.commit_batched(curve, prover_key, wpolys)  # (n,)

        # challenge point sponge (reference 371-389)
        cp_sponge = sponge.clone()
        cp_sponge.absorb_u64(prover_key.supported_degree)
        wcomm_ints = wst.affine_to_ints(curve, wcomms)
        for inst, wc in zip(instances, wcomm_ints):
            inst.absorb_into(curve, cp_sponge)
            cp_sponge.absorb_point(wc)
        challenge_point_int = cp_sponge.squeeze_nonnative_truncated(
            CHALLENGE_POINT_SIZE)[0]
        challenge_point = fp.from_int(fr, challenge_point_int)

        # per-input evaluations at the challenge point (reference 396-419)
        input_evals = poly_ops.evaluate(fr, polys, challenge_point)   # (n, L)
        witness_evals = poly_ops.evaluate(fr, wpolys, challenge_point)

        lc_sponge = sponge.clone()
        lc_sponge.absorb_bytes(
            challenge_point_int.to_bytes((CHALLENGE_POINT_SIZE + 7) // 8, "little"))
        ie_ints = fp.array_to_ints(fr, input_evals)
        we_ints = fp.array_to_ints(fr, witness_evals)
        for ie, we in zip(ie_ints, we_ints):
            lc_sponge.absorb_scalar(ie)
            lc_sponge.absorb_scalar(we)

        proof = [
            SingleProof(
                witness_commitment=Affine(wcomms.x[i], wcomms.y[i], wcomms.inf[i]),
                witness_eval=witness_evals[i],
                eval=input_evals[i],
            )
            for i in range(n)
        ]

        lc_ints = lc_sponge.squeeze_nonnative_truncated(
            LINEAR_COMBINATION_CHALLENGE_SIZE, 2 * n)
        lc = fp.array_from_ints(fr, lc_ints)  # (2n, L)

        # combined polynomial / eval / commitment (reference 431-453)
        all_polys = jnp.concatenate([polys, wpolys], axis=0)  # (2n, D, L)
        combined_poly = poly_ops.weighted_sum(fr, all_polys, lc)
        combined_eval = poly_ops.evaluate(fr, combined_poly, challenge_point)
        all_comms = wst.from_affine(
            curve,
            Affine(
                jnp.concatenate([jnp.stack([i.commitment.x for i in instances]), wcomms.x]),
                jnp.concatenate([jnp.stack([i.commitment.y for i in instances]), wcomms.y]),
                jnp.concatenate([jnp.stack([i.commitment.inf for i in instances]), wcomms.inf]),
            ),
        )
        combined_comm = wst.to_affine(curve, wst.lincomb(curve, all_comms, lc))

        new_instance = InputInstance(
            commitment=combined_comm, point=challenge_point, eval=combined_eval)
        return InstanceWitnessPair(new_instance, combined_poly), proof

    # -- verify -------------------------------------------------------------

    def verify(self, verifier_key: int, input_instances, old_accumulator_instances,
               new_accumulator_instance: InputInstance, proof: Proof,
               sponge: Optional[PoseidonSponge] = None) -> bool:
        curve = self.curve
        fr = curve.fr
        sponge = sponge if sponge is not None else PoseidonSponge(curve.fq)

        all_instances = list(input_instances) + list(old_accumulator_instances)
        if not all_instances:
            all_instances = [InputInstance.zero(curve)]
        n = len(all_instances)
        if len(proof) != n:
            return False

        cp_sponge = sponge.clone()
        cp_sponge.absorb_u64(verifier_key)
        for inst, sp in zip(all_instances, proof):
            inst.absorb_into(curve, cp_sponge)
            common.absorb_affine(cp_sponge, curve, sp.witness_commitment)
        challenge_point_int = cp_sponge.squeeze_nonnative_truncated(
            CHALLENGE_POINT_SIZE)[0]

        if challenge_point_int != fp.to_int(fr, new_accumulator_instance.point):
            return False
        challenge_point = new_accumulator_instance.point

        # per-input identity p_i(c) - v_i = w_i(c) (c - z_i) (reference 536-544)
        evals = jnp.stack([sp.eval for sp in proof])
        wevals = jnp.stack([sp.witness_eval for sp in proof])
        inst_evals = jnp.stack([i.eval for i in all_instances])
        inst_points = jnp.stack([i.point for i in all_instances])
        lhs = fp.sub(fr, evals, inst_evals)
        rhs = fp.mul(fr, wevals, fp.sub(fr, challenge_point[None], inst_points))
        if not bool(np.asarray(fp.eq(lhs, rhs).all())):
            return False

        lc_sponge = sponge.clone()
        lc_sponge.absorb_bytes(
            challenge_point_int.to_bytes((CHALLENGE_POINT_SIZE + 7) // 8, "little"))
        for sp in proof:
            lc_sponge.absorb_scalar(fp.to_int(fr, sp.eval))
            lc_sponge.absorb_scalar(fp.to_int(fr, sp.witness_eval))
        lc_ints = lc_sponge.squeeze_nonnative_truncated(
            LINEAR_COMBINATION_CHALLENGE_SIZE, 2 * n)
        lc = fp.array_from_ints(fr, lc_ints)

        combined_eval = poly_ops.weighted_sum(
            fr, jnp.concatenate([evals, wevals], axis=0), lc)
        if not bool(np.asarray(fp.eq(combined_eval, new_accumulator_instance.eval))):
            return False

        all_comms = wst.from_affine(curve, Affine(
            jnp.concatenate([jnp.stack([i.commitment.x for i in all_instances]),
                             jnp.stack([sp.witness_commitment.x for sp in proof])]),
            jnp.concatenate([jnp.stack([i.commitment.y for i in all_instances]),
                             jnp.stack([sp.witness_commitment.y for sp in proof])]),
            jnp.concatenate([jnp.stack([i.commitment.inf for i in all_instances]),
                             jnp.stack([sp.witness_commitment.inf for sp in proof])]),
        ))
        combined_comm = wst.to_affine(curve, wst.lincomb(curve, all_comms, lc))
        return bool(np.asarray(wst.affine_eq(
            combined_comm, new_accumulator_instance.commitment)))

    # -- decide -------------------------------------------------------------

    def decide(self, decider_key: trivial_pc.TrivialPCKey,
               accumulator: InstanceWitnessPair, sponge=None) -> bool:
        inst = accumulator.instance
        return trivial_pc.check(
            self.curve, decider_key, inst.commitment, inst.point, inst.eval,
            accumulator.witness)
