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


def test_ark_wire_layout(rng):
    """Pin the ark-serialize 0.4 structural invariants (docs/PARITY.md
    deviation 5): 32-byte LE canonical field values; compressed Pallas
    points are 33 bytes — buffer_byte_size(255 modulus bits + 2 SWFlags
    bits) — with the flags alone in the final byte (bit 7 = y is the
    larger root, bit 6 = infinity with zero x payload); u64 LE lengths."""
    import io
    p = PALLAS.fq.modulus
    # field element: canonical LE integer bytes, exactly 32
    x_int = int.from_bytes(rng.bytes(40), "little") % p
    buf = io.BytesIO()
    serialize.write_scalars(
        buf, PALLAS.fr,
        fp.array_from_ints(PALLAS.fr, [x_int % PALLAS.fr.modulus]))
    raw = buf.getvalue()
    assert len(raw) == 32
    assert int.from_bytes(raw, "little") == x_int % PALLAS.fr.modulus

    # compressed point: x LE bytes + flag byte; exercise BOTH y roots
    assert serialize.point_record_size(PALLAS.fq) == 33
    from accumulation_tpu.pc.pedersen import _sample_points
    pt = _sample_points(PALLAS, 1, b"wire-layout")
    pt2 = wst.Affine(pt.x, fp.neg(PALLAS.fq, pt.y), pt.inf)  # the other root
    recs = []
    for q in (pt, pt2):
        b2 = io.BytesIO()
        serialize.write_points(b2, PALLAS, q)
        recs.append(bytearray(b2.getvalue()))
    assert len(recs[0]) == 33
    # exactly one of (y, -y) carries the larger-root flag; x payloads agree
    f0, f1 = recs[0][32] & 0x80, recs[1][32] & 0x80
    assert {f0, f1} == {0, 0x80}
    assert recs[0][:32] == recs[1][:32]
    x_val = int.from_bytes(bytes(recs[0][:32]), "little")
    assert x_val == fp.array_to_ints(PALLAS.fq, pt.x)[0]

    # infinity: zero payload + bit 6
    inf_pt = wst.affine_zero(PALLAS, (1,))
    b3 = io.BytesIO()
    serialize.write_points(b3, PALLAS, inf_pt)
    r3 = b3.getvalue()
    assert r3[32] == 0x40 and not any(r3[:32])

    # u64 LE length prefix
    b4 = io.BytesIO()
    serialize.write_usize(b4, 0x0102030405)
    assert b4.getvalue() == bytes.fromhex("0504030201000000")
