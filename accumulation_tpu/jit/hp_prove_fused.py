"""Fully-fused hp_as accumulation prover: one jitted device program.

The host-orchestrated scheme driver (schemes/hp_as.py) syncs to the host for
each Fiat-Shamir squeeze; this pipeline keeps the entire prove — transcript
included — on device via the DeviceSponge, so an accumulation step is ONE
XLA program (the "forward step of the flagship model" for this framework,
used by __graft_entry__.entry and benchmarkable end-to-end).

Non-zk path; transcript-identical to the host prover (cross-checked by
tests/test_jit_pipeline.py: the host verifier accepts the fused prover's
accumulator).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec, Projective
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE
from ..ops import poly as poly_ops
from .sponge_device import DeviceSponge


class FusedHpResult(NamedTuple):
    acc_comms: Affine      # (3,) combined comm_1..3
    a_fold: jnp.ndarray    # (n, L)
    b_fold: jnp.ndarray
    t_comms: Affine        # (2m-2,) proof commitments (low || high)


def hp_prove_fused(curve: CurveSpec, gens: Affine, inst_comms: Affine,
                   a_stack, b_stack) -> FusedHpResult:
    """gens: (n,) Pedersen key; inst_comms: (m, 3) input commitments;
    a_stack/b_stack: (m, n, L) witness vectors.  Non-zk.

    Every step runs on device (the sponge state is a device array; nothing
    syncs to the host), with each kernel jitted individually.  Wrap in
    `jax.jit` for the single-program variant (used by __graft_entry__.entry
    on tiny shapes) — the one-graph compile is heavyweight, so it is opt-in
    rather than the default."""
    fr = curve.fr
    m, n = a_stack.shape[0], a_stack.shape[1]

    # Fiat-Shamir round 1 (mirrors schemes/hp_as.py prove)
    sponge = DeviceSponge(curve.fq)
    sponge.absorb_u64(gens.x.shape[0])
    for i in range(m):
        for j in range(3):
            sponge.absorb_point(Affine(
                inst_comms.x[i, j], inst_comms.y[i, j], inst_comms.inf[i, j]))
    mus = [fp.to_mont(fr, jnp.asarray(fp.int_to_limbs(1)))]
    for _ in range(m - 1):
        mus.append(sponge.squeeze_fr_truncated(fr, 128))
    mu = jnp.stack(mus)

    # t-vecs (tensorised product polynomial)
    a_scaled = fp.mul(fr, a_stack, mu[:, None, :])
    b_rev = b_stack[::-1]
    prods = fp.mul(fr, a_scaled[:, None], b_rev[None, :])  # (m, m, n, L)
    t_list = []
    for k in range(2 * m - 1):
        terms = [prods[i, k - i]
                 for i in range(max(0, k - m + 1), min(k, m - 1) + 1)]
        acc = terms[0]
        for t in terms[1:]:
            acc = fp.add(fr, acc, t)
        t_list.append(acc)
    t_lowhigh = jnp.stack(t_list[:m - 1] + t_list[m:])  # exclude middle

    t_comms_proj = jax.vmap(
        lambda s: wst.msm_bitserial(curve, gens, s))(t_lowhigh)
    t_comms = wst.to_affine(curve, t_comms_proj)

    # Fiat-Shamir round 2
    for i in range(2 * m - 2):
        sponge.absorb_point(Affine(t_comms.x[i], t_comms.y[i], t_comms.inf[i]))
    nu = sponge.squeeze_fr_truncated(fr, 128)
    nus = poly_ops.powers(fr, nu, 2 * m - 1)  # (2m-1, L)
    cc = fp.mul(fr, mu, nus[:m])

    # combined commitments
    c1 = wst.from_affine(curve, Affine(
        inst_comms.x[:, 0], inst_comms.y[:, 0], inst_comms.inf[:, 0]))
    c2 = wst.from_affine(curve, Affine(
        inst_comms.x[::-1, 1], inst_comms.y[::-1, 1], inst_comms.inf[::-1, 1]))
    c3 = wst.from_affine(curve, Affine(
        inst_comms.x[:, 2], inst_comms.y[:, 2], inst_comms.inf[:, 2]))
    comb_1 = wst.lincomb(curve, c1, cc)
    comb_2 = wst.lincomb(curve, c2, nus[:m])
    comm3_inner = wst.lincomb(curve, c3, mu)
    comm3_scaled = wst.scalar_mul(curve, comm3_inner, nus[m - 1])
    if m > 1:
        low = wst.from_affine(curve, Affine(
            t_comms.x[:m - 1], t_comms.y[:m - 1], t_comms.inf[:m - 1]))
        high = wst.from_affine(curve, Affine(
            t_comms.x[m - 1:], t_comms.y[m - 1:], t_comms.inf[m - 1:]))
        low_add = wst.lincomb(curve, low, nus[:m - 1])
        high_add = wst.lincomb(curve, high, nus[m:2 * m - 1])
        comb_3 = wst.proj_add(curve, low_add,
                             wst.proj_add(curve, high_add, comm3_scaled))
    else:
        comb_3 = comm3_scaled
    acc_comms = wst.to_affine(curve, Projective(
        jnp.stack([comb_1.x, comb_2.x, comb_3.x]),
        jnp.stack([comb_1.y, comb_2.y, comb_3.y]),
        jnp.stack([comb_1.z, comb_2.z, comb_3.z])))

    # combined witness
    a_fold = poly_ops.weighted_sum(fr, a_stack, cc)
    b_fold = poly_ops.weighted_sum(fr, b_stack[::-1], nus[:m])
    return FusedHpResult(acc_comms, a_fold, b_fold, t_comms)
