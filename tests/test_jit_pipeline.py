"""Fused device pipeline tests: device sponge == host sponge; the fused
jitted hp prover's accumulator passes the host verifier."""

import jax.numpy as jnp
import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.jit.sponge_device import DeviceSponge
from accumulation_tpu.jit.hp_prove_fused import hp_prove_fused
from accumulation_tpu.ops.sponge import PoseidonSponge
from accumulation_tpu.pc import pedersen
from accumulation_tpu.schemes import common as scommon, hp_as


def test_device_sponge_matches_host(rng):
    curve = PALLAS
    host = PoseidonSponge(curve.fq)
    dev = DeviceSponge(curve.fq)
    # u64 absorb
    host.absorb_u64(42)
    dev.absorb_u64(42)
    # point absorb
    pt_int = (5, 7)
    host.absorb_point(pt_int)
    dev.absorb_point(wst.affine_from_ints(curve, [pt_int]).__class__(
        *[a[0] for a in wst.affine_from_ints(curve, [pt_int])]))
    # infinity point
    host.absorb_point(None)
    inf_pt = wst.affine_zero(curve, ())
    dev.absorb_point(inf_pt)
    h = host.squeeze_nonnative_truncated(128, 2)
    d = [fp.to_int(curve.fr, dev.squeeze_fr_truncated(curve.fr, 128))
         for _ in range(2)]
    assert h == d
    # 184-bit squeeze path
    h184 = host.squeeze_nonnative_truncated(184)[0]
    d184 = fp.to_int(curve.fr, dev.squeeze_fr_truncated(curve.fr, 184))
    assert h184 == d184


def test_fused_prove_matches_host_verifier(rng):
    curve = PALLAS
    m, n = 3, 8
    scheme = hp_as.ASForHadamardProducts(curve)
    ck, vk, dk = scheme.index(None, None, n)

    pairs = []
    for _ in range(m):
        a = fp.random_elements(curve.fr, rng, (n,))
        b = fp.random_elements(curve.fr, rng, (n,))
        prod = hp_as.compute_hp(curve, a, b)
        comms = pedersen.commit_batched(curve, ck, jnp.stack([a, b, prod]))
        cl = scommon.unstack_affine(comms)
        pairs.append((hp_as.InputInstance(cl[0], cl[1], cl[2]),
                      hp_as.InputWitness(a, b, None)))

    inst_comms = wst.Affine(
        jnp.stack([jnp.stack([p[0].comm_1.x, p[0].comm_2.x, p[0].comm_3.x])
                   for p in pairs]),
        jnp.stack([jnp.stack([p[0].comm_1.y, p[0].comm_2.y, p[0].comm_3.y])
                   for p in pairs]),
        jnp.stack([jnp.stack([p[0].comm_1.inf, p[0].comm_2.inf, p[0].comm_3.inf])
                   for p in pairs]),
    )
    a_stack = jnp.stack([p[1].a_vec for p in pairs])
    b_stack = jnp.stack([p[1].b_vec for p in pairs])

    result = hp_prove_fused(curve, ck.generators, inst_comms, a_stack, b_stack)

    # package as scheme objects and run the HOST verifier + decider
    acc_inst = hp_as.InputInstance(
        wst.Affine(result.acc_comms.x[0], result.acc_comms.y[0], result.acc_comms.inf[0]),
        wst.Affine(result.acc_comms.x[1], result.acc_comms.y[1], result.acc_comms.inf[1]),
        wst.Affine(result.acc_comms.x[2], result.acc_comms.y[2], result.acc_comms.inf[2]))
    low = wst.Affine(result.t_comms.x[:m - 1], result.t_comms.y[:m - 1],
                     result.t_comms.inf[:m - 1])
    high = wst.Affine(result.t_comms.x[m - 1:], result.t_comms.y[m - 1:],
                      result.t_comms.inf[m - 1:])
    proof = hp_as.Proof(low, high, None)

    assert scheme.verify(vk, [p[0] for p in pairs], [], acc_inst, proof), \
        "host verifier rejected the fused prover's accumulator"

    from accumulation_tpu.core.accumulation import InstanceWitnessPair
    acc = InstanceWitnessPair(
        acc_inst, hp_as.InputWitness(result.a_fold, result.b_fold, None))
    assert scheme.decide(dk, acc)
