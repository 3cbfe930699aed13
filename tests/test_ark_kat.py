"""Hand-derived ark-serialize 0.4 known-answer vectors (compressed mode).

Settles the arkworks wire-compatibility question (SURVEY.md hard part (f),
docs/PARITY.md deviation 5) to the extent possible without a Rust
toolchain: every byte below is derived BY HAND from the ark-serialize 0.4
spec rules, independently of the codec under test:

  * `Fp::serialize_with_mode` writes the canonical (non-Montgomery) value
    as little-endian bytes into buffer_byte_size(MODULUS_BITS) bytes —
    32 for the 255-bit Pasta fields.
  * `Affine::serialize_with_mode` (compressed) writes x with SWFlags into
    buffer_byte_size(MODULUS_BITS + 2) bytes = 33 for Pallas: bytes 0..32
    are x LE, the final byte holds the flags — `YIsNegative = 1 << 7`
    (set iff y > -y as canonical integers), `PointAtInfinity = 1 << 6`
    (with zero x payload), `YIsPositive = 0`.
  * `Vec<T>`: u64 LE length then elements; `Option<T>`: 0/1 byte then
    payload; structs: fields concatenated in derive order.

The Pallas generator is (-1, 2) (curve y^2 = x^3 + 5), so its record is
fully hand-computable: x = p-1 LE, y = 2 < p-2 = -y so flags = 0.
"""

import io

import numpy as np

from accumulation_tpu.curves import PALLAS, weierstrass as wst
from accumulation_tpu.fields import fp
from accumulation_tpu.utils import serialize

P = PALLAS.fq.modulus  # Pallas base field (= Vesta scalar field)
R = PALLAS.fr.modulus  # Pallas scalar field


def _le32(x: int) -> bytes:
    return x.to_bytes(32, "little")


def _ser_scalars(spec, ints):
    buf = io.BytesIO()
    serialize.write_scalars(buf, spec, fp.array_from_ints(spec, list(ints)))
    return buf.getvalue()


def _ser_points(pts) -> bytes:
    buf = io.BytesIO()
    serialize.write_points(buf, PALLAS, pts)
    return buf.getvalue()


def test_kat_field_elements():
    # Fr(0), Fr(1), Fr(r-1): canonical LE, exactly 32 bytes each
    assert _ser_scalars(PALLAS.fr, [0]) == b"\x00" * 32
    assert _ser_scalars(PALLAS.fr, [1]) == b"\x01" + b"\x00" * 31
    assert _ser_scalars(PALLAS.fr, [R - 1]) == _le32(R - 1)
    # a concatenated Vec payload is elementwise identical
    assert _ser_scalars(PALLAS.fr, [1, 2]) == \
        (b"\x01" + b"\x00" * 31) + (b"\x02" + b"\x00" * 31)


def test_kat_generator_point():
    # G = (-1, 2): x = p-1 LE over 32 bytes, y=2 is the SMALLER root
    # (2 <= p-2) -> YIsPositive -> flag byte 0x00
    g = wst.generator(PALLAS)
    rec = _ser_points(g)
    assert rec == _le32(P - 1) + b"\x00"


def test_kat_negated_generator():
    # -G = (-1, p-2): y = p-2 > 2 = -y -> YIsNegative -> flag byte 0x80
    g = wst.generator(PALLAS)
    neg_g = wst.Affine(g.x, fp.neg(PALLAS.fq, g.y), g.inf)
    rec = _ser_points(neg_g)
    assert rec == _le32(P - 1) + b"\x80"


def test_kat_infinity():
    # PointAtInfinity: zero x payload, flag byte 0x40
    rec = _ser_points(wst.affine_zero(PALLAS, ()))
    assert rec == b"\x00" * 32 + b"\x40"


def test_kat_vec_and_option():
    # Vec<G> of [G, infinity]: u64 LE len 2, then the two records
    buf = io.BytesIO()
    g = wst.generator(PALLAS)
    both = wst.Affine(
        np.stack([np.asarray(g.x), np.asarray(wst.affine_zero(PALLAS, ()).x)]),
        np.stack([np.asarray(g.y), np.asarray(wst.affine_zero(PALLAS, ()).y)]),
        np.asarray([False, True]))
    import jax.numpy as jnp
    both = wst.Affine(jnp.asarray(both.x), jnp.asarray(both.y),
                      jnp.asarray(both.inf))
    serialize.write_point_vec(buf, PALLAS, both)
    expect = (2).to_bytes(8, "little") + _le32(P - 1) + b"\x00" \
        + b"\x00" * 32 + b"\x40"
    assert buf.getvalue() == expect

    # Option: None -> 0x00; Some(Fr(5)) -> 0x01 + payload
    b2 = io.BytesIO()
    serialize.write_opt_tag(b2, False)
    assert b2.getvalue() == b"\x00"
    b3 = io.BytesIO()
    serialize.write_opt_tag(b3, True)
    serialize.write_scalars(b3, PALLAS.fr,
                            fp.array_from_ints(PALLAS.fr, [5]))
    assert b3.getvalue() == b"\x01" + b"\x05" + b"\x00" * 31


def test_kat_doubled_generator():
    """2G computed with plain python ints from the affine doubling law is
    what the codec emits for the device kernel's 2G — ties the wire format
    to an implementation-independent ground truth."""
    # lambda = 3x^2 / 2y with x = p-1 (x^2 = 1), y = 2  ->  3 * inv(4)
    lam = 3 * pow(4, -1, P) % P
    x3 = (lam * lam - 2 * (P - 1)) % P
    y3 = (lam * ((P - 1) - x3) - 2) % P
    flag = 0x80 if y3 > P - y3 else 0x00
    expect = _le32(x3) + bytes([flag])

    g = wst.generator(PALLAS)
    g2 = wst.to_affine(
        PALLAS, wst.scalar_mul_int(PALLAS, wst.from_affine(PALLAS, g), 2))
    assert _ser_points(g2) == expect


def test_kat_ipa_proof_layout():
    """ipa_pc::Proof derive order (l_vec, r_vec, final_comm_key, c,
    hiding_comm, rand) with per-Vec u64 prefixes: hand-assembled bytes for
    a degenerate proof (empty fold vectors, final key = G, c = 1, no
    hiding) match the codec."""
    from accumulation_tpu.pc import ipa_pc
    g = wst.generator(PALLAS)
    proof = ipa_pc.Proof(
        l_vec=wst.affine_zero(PALLAS, (0,)),
        r_vec=wst.affine_zero(PALLAS, (0,)),
        final_comm_key=g,
        c=fp.array_from_ints(PALLAS.fr, [1])[0],
        hiding_comm=None,
        rand=None,
    )
    got = serialize.serialize_ipa_proof(PALLAS, proof)
    expect = ((0).to_bytes(8, "little")          # l_vec: Vec len 0
              + (0).to_bytes(8, "little")        # r_vec: Vec len 0
              + _le32(P - 1) + b"\x00"           # final_comm_key = G
              + b"\x01" + b"\x00" * 31           # c = Fr(1)
              + b"\x00"                          # hiding_comm: None
              + b"\x00")                         # rand: None
    assert got == expect
