"""Canonical serialization for all scheme objects (checkpoint/persistence).

The reference's persistence story is `CanonicalSerialize/Deserialize` derives
on every instance/witness/proof (SURVEY.md §5: an accumulator IS the
checkpoint of an accumulation chain; resume = feed it back as an old
accumulator).  This module provides the same capability with an
arkworks-style codec:

  * field element: 32 bytes, little-endian canonical value;
  * affine point (compressed): exact ark-serialize 0.4 layout — x as LE
    bytes with two flag bits (bit 7: y is the lexicographically larger
    root; bit 6: infinity) in the final byte of a record sized to hold
    255-bit x + 2 flag bits.  For Pallas that is a 33-byte record with a
    DEDICATED flag byte (the flags do not fit in x's top byte); for
    BLS12-381 Fq (381-bit) a 48-byte record where flags share x's final
    byte.  Layout pinned by hand-derived KATs in tests/test_ark_kat.py and
    docs/PARITY.md #5;
  * usize/length: 8 bytes LE;  Option<T>: 1-byte tag + payload;
  * Vec<T>: 8-byte LE length prefix + items.

Point decompression recovers y with the batched on-device square root.  When
the native C++ codec (accumulation_tpu.utils.native) is available, bulk
limb<->byte conversion uses it; otherwise numpy.
"""

from __future__ import annotations

import io
import struct
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE, FieldSpec

FLAG_Y_LARGER = 0x80
FLAG_INFINITY = 0x40


# ---------------------------------------------------------------------------
# bulk limb <-> byte conversion
# ---------------------------------------------------------------------------


def limbs_to_bytes(canon: np.ndarray) -> np.ndarray:
    """(n, nl) canonical uint32 16-bit limbs -> (n, 2*nl) uint8 LE."""
    try:
        from . import native
        if native.available() and canon.shape[-1] == NLIMBS:
            return native.limbs_to_bytes(canon)
    except Exception:
        pass
    as16 = canon.astype(np.uint16)
    return as16.view(np.uint8).reshape(canon.shape[0], 2 * canon.shape[-1])


def bytes_to_limbs(data: np.ndarray) -> np.ndarray:
    """(n, 2*nl) uint8 LE -> (n, nl) canonical uint32 limbs."""
    try:
        from . import native
        if native.available() and data.shape[-1] == 2 * NLIMBS:
            return native.bytes_to_limbs(data)
    except Exception:
        pass
    as16 = np.ascontiguousarray(data, dtype=np.uint8).view(np.uint16)
    return as16.reshape(data.shape[0], data.shape[-1] // 2).astype(np.uint32)


# ---------------------------------------------------------------------------
# scalars
# ---------------------------------------------------------------------------


def write_scalars(buf: io.BytesIO, spec: FieldSpec, arr):
    """arr: (..., nl) Montgomery -> concatenated 2*nl-byte LE values."""
    canon = np.asarray(fp.from_mont(spec, arr)).reshape(-1, spec.nlimbs)
    buf.write(limbs_to_bytes(canon).tobytes())


def read_scalars(buf: io.BytesIO, spec: FieldSpec, shape):
    n = int(np.prod(shape)) if shape else 1
    nb = 2 * spec.nlimbs
    raw = np.frombuffer(buf.read(nb * n), dtype=np.uint8).reshape(n, nb)
    limbs = bytes_to_limbs(raw)
    arr = fp.to_mont(spec, jnp.asarray(limbs))
    return arr.reshape(*shape, spec.nlimbs) if shape else arr[0]


def write_usize(buf, x: int):
    buf.write(struct.pack("<Q", x))


def read_usize(buf) -> int:
    return struct.unpack("<Q", buf.read(8))[0]


def write_bytes_fixed(buf, b: bytes):
    buf.write(b)


def write_opt_tag(buf, present: bool):
    buf.write(b"\x01" if present else b"\x00")


def read_opt_tag(buf) -> bool:
    return buf.read(1) == b"\x01"


# ---------------------------------------------------------------------------
# points (compressed)
# ---------------------------------------------------------------------------


def _rows_gt(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Integer row comparison a > b for (n, NLIMBS) LE limb arrays.

    Vectorised MSB-down pass: O(NLIMBS) numpy ops total, independent of n
    (replaces the per-point python byte-string loop — hostile at 2^20-point
    keys)."""
    gt = np.zeros(a.shape[0], dtype=bool)
    eq = np.ones(a.shape[0], dtype=bool)
    for i in range(a.shape[1] - 1, -1, -1):
        gt |= eq & (a[:, i] > b[:, i])
        eq &= a[:, i] == b[:, i]
    return gt


def point_record_size(f: FieldSpec) -> int:
    """ark-serialize 0.4 compressed SW record size:
    buffer_byte_size(MODULUS_BITS + SWFlags::BIT_SIZE=2).  Pallas (255-bit
    modulus): 255+2 = 257 bits -> 33 bytes (x fills all 255 payload bits,
    flags overflow into a dedicated final byte); BLS12-381 Fq (381-bit):
    383 bits -> 48 bytes (flags share x's final byte)."""
    return (f.modulus.bit_length() + 2 + 7) // 8


def write_points(buf: io.BytesIO, curve: CurveSpec, pts: Affine):
    """pts: batched (n,) affine -> n ark-compressed records (x LE bytes,
    SWFlags in the top two bits of the record's final byte: bit 7 = y is
    the lexicographically larger root, bit 6 = infinity, zero payload)."""
    f = curve.fq
    if pts.x.ndim == 1:
        pts = Affine(pts.x[None], pts.y[None], pts.inf[None])
    xc = np.asarray(fp.from_mont(f, pts.x))
    yc = np.asarray(fp.from_mont(f, pts.y))
    yneg = np.asarray(fp.from_mont(f, fp.neg(f, pts.y)))
    inf = np.asarray(pts.inf)
    data = limbs_to_bytes(xc).copy()
    nb = point_record_size(f)
    if nb > data.shape[1]:  # flags need extra byte(s) past the x payload
        pad = np.zeros((data.shape[0], nb - data.shape[1]), dtype=np.uint8)
        data = np.concatenate([data, pad], axis=1)
    top = nb - 1  # flags live in the record's final byte
    # y larger <=> y > p - y as integers (batched limb comparison)
    larger = _rows_gt(yc, yneg)
    data[:, top] |= np.where(larger, FLAG_Y_LARGER, 0).astype(np.uint8)
    data[:, top] |= np.where(inf, FLAG_INFINITY, 0).astype(np.uint8)
    data[inf, :top] = 0
    buf.write(data.tobytes())


def read_points(buf: io.BytesIO, curve: CurveSpec, n: int) -> Affine:
    """Reads n compressed points; recovers y via batched device sqrt."""
    f = curve.fq
    nb = point_record_size(f)
    raw = np.frombuffer(buf.read(nb * n), dtype=np.uint8).reshape(n, nb).copy()
    flags = raw[:, nb - 1] & 0xC0
    raw[:, nb - 1] &= 0x3F
    if nb > 2 * f.nlimbs:
        raw = raw[:, :2 * f.nlimbs]
    inf = (flags & FLAG_INFINITY) != 0
    larger = (flags & FLAG_Y_LARGER) != 0
    x = fp.to_mont(f, jnp.asarray(bytes_to_limbs(raw)))
    rhs = fp.add(
        f, fp.mul(f, fp.square(f, x), x),
        jnp.broadcast_to(jnp.asarray(curve.b_mont, DTYPE), x.shape))
    y, ok = fp.sqrt(f, rhs)
    if not bool(np.asarray(ok | jnp.asarray(inf)).all()):
        raise ValueError("invalid point encoding: x not on curve")
    y_neg = fp.neg(f, y)
    # canonicalise: y_small = lexicographically smaller root (batched)
    yc = np.asarray(fp.from_mont(f, y))
    ync = np.asarray(fp.from_mont(f, y_neg))
    small_is_y = ~_rows_gt(yc, ync)
    take_neg = jnp.asarray(np.where(larger, small_is_y, ~small_is_y))
    y = jnp.where(take_neg[:, None], y_neg, y)
    xz = jnp.where(jnp.asarray(inf)[:, None], jnp.zeros_like(x), x)
    yz = jnp.where(jnp.asarray(inf)[:, None], jnp.zeros_like(y), y)
    return Affine(xz, yz, jnp.asarray(inf))


def write_point(buf, curve, pt: Affine):
    write_points(buf, curve, pt)


def read_point(buf, curve) -> Affine:
    pts = read_points(buf, curve, 1)
    return Affine(pts.x[0], pts.y[0], pts.inf[0])


# ---------------------------------------------------------------------------
# scheme-object codecs
# ---------------------------------------------------------------------------


def write_scalar_vec(buf, spec: FieldSpec, arr):
    """ark `Vec<F>`: u64 LE length prefix + elements (derive layout)."""
    write_usize(buf, int(arr.shape[0]))
    if arr.shape[0]:
        write_scalars(buf, spec, arr)


def read_scalar_vec(buf, spec: FieldSpec):
    n = read_usize(buf)
    return read_scalars(buf, spec, (n,))


def write_point_vec(buf, curve: CurveSpec, pts: Affine):
    """ark `Vec<G>`: u64 LE length prefix + compressed points."""
    n = int(pts.x.shape[0])
    write_usize(buf, n)
    if n:
        write_points(buf, curve, pts)


def read_point_vec(buf, curve: CurveSpec) -> Affine:
    n = read_usize(buf)
    if n == 0:
        return wst.affine_zero(curve, (0,))
    return read_points(buf, curve, n)


def serialize_hp_accumulator(curve: CurveSpec, acc) -> bytes:
    """hp_as accumulator (instance + witness) -> bytes.

    Field order follows the reference's derive order exactly
    (/root/reference/src/hp_as/data_structures.rs:13-88): InputInstance
    {comm_1, comm_2, comm_3} then InputWitness{a_vec, b_vec, randomness}
    with each Vec carrying its own u64 LE length prefix (ark-serialize 0.4
    derive layout; see docs/PARITY.md field-order table)."""
    buf = io.BytesIO()
    inst, wit = acc.instance, acc.witness
    for c in (inst.comm_1, inst.comm_2, inst.comm_3):
        write_point(buf, curve, c)
    write_scalar_vec(buf, curve.fr, wit.a_vec)
    write_scalar_vec(buf, curve.fr, wit.b_vec)
    write_opt_tag(buf, wit.randomness is not None)
    if wit.randomness is not None:
        for r in (wit.randomness.rand_1, wit.randomness.rand_2,
                  wit.randomness.rand_3):
            write_scalars(buf, curve.fr, r)
    return buf.getvalue()


def deserialize_hp_accumulator(curve: CurveSpec, data: bytes):
    from ..core.accumulation import InstanceWitnessPair
    from ..schemes import hp_as
    buf = io.BytesIO(data)
    comms = [read_point(buf, curve) for _ in range(3)]
    a_vec = read_scalar_vec(buf, curve.fr)
    b_vec = read_scalar_vec(buf, curve.fr)
    randomness = None
    if read_opt_tag(buf):
        r1 = read_scalars(buf, curve.fr, ())
        r2 = read_scalars(buf, curve.fr, ())
        r3 = read_scalars(buf, curve.fr, ())
        randomness = hp_as.InputWitnessRandomness(r1, r2, r3)
    inst = hp_as.InputInstance(comms[0], comms[1], comms[2])
    wit = hp_as.InputWitness(a_vec, b_vec, randomness)
    return InstanceWitnessPair(inst, wit)


def write_ipa_proof(buf, curve: CurveSpec, proof):
    """ark-poly-commit `ipa_pc::Proof` derive order: l_vec, r_vec,
    final_comm_key, c, hiding_comm, rand — each Vec with its own u64
    length prefix, Options as 1-byte tags (no outer framing)."""
    write_point_vec(buf, curve, proof.l_vec)
    write_point_vec(buf, curve, proof.r_vec)
    write_point(buf, curve, proof.final_comm_key)
    write_scalars(buf, curve.fr, proof.c)
    write_opt_tag(buf, proof.hiding_comm is not None)
    if proof.hiding_comm is not None:
        write_point(buf, curve, proof.hiding_comm)
    write_opt_tag(buf, proof.rand is not None)
    if proof.rand is not None:
        write_scalars(buf, curve.fr, proof.rand)


def read_ipa_proof(buf, curve: CurveSpec):
    from ..pc import ipa_pc
    l_vec = read_point_vec(buf, curve)
    r_vec = read_point_vec(buf, curve)
    final_key = read_point(buf, curve)
    c = read_scalars(buf, curve.fr, ())
    hiding_comm = read_point(buf, curve) if read_opt_tag(buf) else None
    rand = read_scalars(buf, curve.fr, ()) if read_opt_tag(buf) else None
    return ipa_pc.Proof(l_vec, r_vec, final_key, c, hiding_comm, rand)


def serialize_ipa_proof(curve: CurveSpec, proof) -> bytes:
    buf = io.BytesIO()
    write_ipa_proof(buf, curve, proof)
    return buf.getvalue()


def deserialize_ipa_proof(curve: CurveSpec, data: bytes):
    return read_ipa_proof(io.BytesIO(data), curve)


def serialize_ipa_accumulator(curve: CurveSpec, acc) -> bytes:
    """ipa_pc_as accumulator (atomic: instance only) -> bytes.

    Derive order of the reference's InputInstance
    (/root/reference/src/ipa_pc_as/data_structures.rs:55-68):
    ipa_commitment, point, evaluation, ipa_proof — concatenated with no
    framing, exactly like the CanonicalSerialize derive.  The commitment
    is the bare group element (the reference's LabeledCommitment label /
    degree_bound / shifted_comm are empty in AS usage; docs/PARITY.md)."""
    buf = io.BytesIO()
    inst = acc.instance
    write_point(buf, curve, inst.ipa_commitment)
    write_scalars(buf, curve.fr, inst.point)
    write_scalars(buf, curve.fr, inst.evaluation)
    write_ipa_proof(buf, curve, inst.ipa_proof)
    return buf.getvalue()


def deserialize_ipa_accumulator(curve: CurveSpec, data: bytes):
    from ..core.accumulation import InstanceWitnessPair
    from ..schemes import ipa_pc_as
    buf = io.BytesIO(data)
    comm = read_point(buf, curve)
    point = read_scalars(buf, curve.fr, ())
    evaluation = read_scalars(buf, curve.fr, ())
    proof = read_ipa_proof(buf, curve)
    inst = ipa_pc_as.InputInstance(comm, point, evaluation, proof)
    return InstanceWitnessPair(inst, None)


def serialized_size(data: bytes) -> int:
    return len(data)
