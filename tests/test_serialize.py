"""Serialization round-trip tests + native codec/field golden checks."""

import numpy as np
import pytest

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.utils import native, serialize


def test_native_builds_and_matches_python():
    assert native.available(), "native helper failed to build"
    p = PALLAS.fq.modulus
    rng = np.random.default_rng(0)
    a = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(16)]
    b = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(16)]
    rinv = pow(1 << 256, -1, p)
    got = native.mont_mul(p, a, b)
    assert got == [x * y * rinv % p for x, y in zip(a, b)]


def test_native_matches_device_kernels(rng):
    """The C++ reference field implementation is the golden-vector source for
    the device limb kernels (SURVEY.md §7.1)."""
    p = PALLAS.fq.modulus
    FQ = PALLAS.fq
    xs = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(8)]
    ys = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(8)]
    # device mul computes (x*y) mod p on canonical ints via Montgomery form;
    # native mont_mul computes x*y*R^{-1}: feed it Montgomery operands.
    r = FQ.r_mod_p
    a_m = [x * r % p for x in xs]
    b_m = [y * r % p for y in ys]
    native_out = native.mont_mul(p, a_m, b_m)  # = x*y*R mod p
    dev = fp.array_to_ints(
        FQ, fp.mul(FQ, fp.array_from_ints(FQ, xs), fp.array_from_ints(FQ, ys)))
    assert [v * pow(r, -1, p) % p for v in native_out] == dev


def test_limb_byte_codec(rng):
    canon = rng.integers(0, 1 << 16, size=(10, 16), dtype=np.uint32)
    b = serialize.limbs_to_bytes(canon)
    back = serialize.bytes_to_limbs(b)
    assert (back == canon).all()


def test_point_roundtrip(rng):
    curve = PALLAS
    g = wst.generator(curve)
    gj = wst.from_affine(curve, g)
    ks = fp.random_elements(curve.fr, rng, (6,))
    import jax.numpy as jnp
    gjb = wst.Projective(
        jnp.broadcast_to(gj.x, (6, 16)), jnp.broadcast_to(gj.y, (6, 16)),
        jnp.broadcast_to(gj.z, (6, 16)))
    pts = wst.to_affine(curve, wst.scalar_mul(curve, gjb, ks))
    # include an infinity
    pts = wst.Affine(pts.x, pts.y, pts.inf.at[2].set(True))
    import io
    buf = io.BytesIO()
    serialize.write_points(buf, curve, pts)
    buf.seek(0)
    back = serialize.read_points(buf, curve, 6)
    assert bool(np.asarray(wst.affine_eq(back, pts) | pts.inf).all())
    assert bool(np.asarray(back.inf)[2])


def test_hp_accumulator_roundtrip(rng):
    from accumulation_tpu.core.accumulation import InstanceWitnessPair
    from accumulation_tpu.pc import pedersen
    from accumulation_tpu.schemes import hp_as
    import jax.numpy as jnp
    curve = PALLAS
    ck = pedersen.trim(pedersen.setup(curve, 4), 4)
    a = fp.random_elements(curve.fr, rng, (4,))
    b = fp.random_elements(curve.fr, rng, (4,))
    prod = hp_as.compute_hp(curve, a, b)
    comms = pedersen.commit_batched(curve, ck, jnp.stack([a, b, prod]))
    from accumulation_tpu.schemes.common import unstack_affine
    cl = unstack_affine(comms)
    acc = InstanceWitnessPair(
        hp_as.InputInstance(cl[0], cl[1], cl[2]),
        hp_as.InputWitness(a, b, None))
    data = serialize.serialize_hp_accumulator(curve, acc)
    back = serialize.deserialize_hp_accumulator(curve, data)
    assert back.instance.eq(curve, acc.instance)
    assert fp.array_to_ints(curve.fr, back.witness.a_vec) == \
        fp.array_to_ints(curve.fr, acc.witness.a_vec)


def test_ipa_accumulator_roundtrip(rng):
    from accumulation_tpu.core.accumulation import InstanceWitnessPair
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.schemes import ipa_pc_as
    curve = PALLAS
    ck = ipa_pc.trim(ipa_pc.setup(curve, 7), 7)
    coeffs = fp.random_elements(curve.fr, rng, (8,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, ck, coeffs)
    proof = ipa_pc.open(curve, ck, coeffs, comm, point)
    value = poly_ops.evaluate(curve.fr, coeffs, point)
    acc = InstanceWitnessPair(
        ipa_pc_as.InputInstance(comm, point, value, proof), None)
    data = serialize.serialize_ipa_accumulator(curve, acc)
    back = serialize.deserialize_ipa_accumulator(curve, data)
    # deserialized accumulator still passes the full IPA check (decider)
    assert ipa_pc.check(curve, ck, back.instance.ipa_commitment,
                        back.instance.point, back.instance.evaluation,
                        back.instance.ipa_proof)
