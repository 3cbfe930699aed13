"""Curve genericity: the schemes run unchanged over the cycle partner
(Vesta), as needed for two-curve PCD recursion."""

import jax.numpy as jnp
import numpy as np

import harness
from accumulation_tpu.core.accumulation import InstanceWitnessPair
from accumulation_tpu.curves import VESTA, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.pc import pedersen
from accumulation_tpu.schemes import hp_as
from accumulation_tpu.schemes.hp_as import (ASForHadamardProducts,
                                            InputInstance, InputWitness)


def test_vesta_generator_on_curve():
    g = wst.generator(VESTA)
    assert bool(np.asarray(wst.is_on_curve(VESTA, g)))


def test_hp_as_over_vesta(rng):
    curve = VESTA
    scheme = ASForHadamardProducts(curve)
    keys = scheme.index(None, None, 8)

    def gen(n):
        out = []
        for _ in range(n):
            a = fp.random_elements(curve.fr, rng, (8,))
            b = fp.random_elements(curve.fr, rng, (8,))
            prod = hp_as.compute_hp(curve, a, b)
            comms = pedersen.commit_batched(curve, keys[0], jnp.stack([a, b, prod]))
            cl = hp_as.common.unstack_affine(comms)
            out.append(InstanceWitnessPair(
                InputInstance(cl[0], cl[1], cl[2]), InputWitness(a, b, None)))
        return out

    assert harness.test_template(
        scheme, keys, gen, harness.SIMPLE_ACCUMULATION, make_zk=False,
        rng=rng, num_iterations=1)
