"""Canonical serialization for all scheme objects (checkpoint/persistence).

The reference's persistence story is `CanonicalSerialize/Deserialize` derives
on every instance/witness/proof (SURVEY.md §5: an accumulator IS the
checkpoint of an accumulation chain; resume = feed it back as an old
accumulator).  This module provides the same capability with an
arkworks-style codec:

  * field element: 32 bytes, little-endian canonical value;
  * affine point (compressed): 32 bytes of x with two flag bits in the top
    byte — bit 7: y is the lexicographically larger root; bit 6: infinity;
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


def write_points(buf: io.BytesIO, curve: CurveSpec, pts: Affine):
    """pts: batched (n,) affine -> n compressed 32-byte records."""
    f = curve.fq
    if pts.x.ndim == 1:
        pts = Affine(pts.x[None], pts.y[None], pts.inf[None])
    xc = np.asarray(fp.from_mont(f, pts.x))
    yc = np.asarray(fp.from_mont(f, pts.y))
    yneg = np.asarray(fp.from_mont(f, fp.neg(f, pts.y)))
    inf = np.asarray(pts.inf)
    data = limbs_to_bytes(xc).copy()
    top = data.shape[1] - 1  # flags live in the record's top byte
    # y larger <=> y > p - y as integers (batched limb comparison)
    larger = _rows_gt(yc, yneg)
    data[:, top] |= np.where(larger, FLAG_Y_LARGER, 0).astype(np.uint8)
    data[:, top] |= np.where(inf, FLAG_INFINITY, 0).astype(np.uint8)
    data[inf, :top] = 0
    buf.write(data.tobytes())


def read_points(buf: io.BytesIO, curve: CurveSpec, n: int) -> Affine:
    """Reads n compressed points; recovers y via batched device sqrt."""
    f = curve.fq
    nb = 2 * f.nlimbs
    raw = np.frombuffer(buf.read(nb * n), dtype=np.uint8).reshape(n, nb).copy()
    flags = raw[:, nb - 1] & 0xC0
    raw[:, nb - 1] &= 0x3F
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


def serialize_hp_accumulator(curve: CurveSpec, acc) -> bytes:
    """hp_as accumulator (instance + witness) -> bytes."""
    from ..schemes import hp_as
    buf = io.BytesIO()
    inst, wit = acc.instance, acc.witness
    for c in (inst.comm_1, inst.comm_2, inst.comm_3):
        write_point(buf, curve, c)
    write_usize(buf, wit.a_vec.shape[0])
    write_scalars(buf, curve.fr, wit.a_vec)
    write_scalars(buf, curve.fr, wit.b_vec)
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
    n = read_usize(buf)
    a_vec = read_scalars(buf, curve.fr, (n,))
    b_vec = read_scalars(buf, curve.fr, (n,))
    randomness = None
    if read_opt_tag(buf):
        r1 = read_scalars(buf, curve.fr, ())
        r2 = read_scalars(buf, curve.fr, ())
        r3 = read_scalars(buf, curve.fr, ())
        randomness = hp_as.InputWitnessRandomness(r1, r2, r3)
    inst = hp_as.InputInstance(comms[0], comms[1], comms[2])
    wit = hp_as.InputWitness(a_vec, b_vec, randomness)
    return InstanceWitnessPair(inst, wit)


def serialize_ipa_proof(curve: CurveSpec, proof) -> bytes:
    buf = io.BytesIO()
    k = proof.l_vec.x.shape[0]
    write_usize(buf, k)
    if k:
        write_points(buf, curve, proof.l_vec)
        write_points(buf, curve, proof.r_vec)
    write_point(buf, curve, proof.final_comm_key)
    write_scalars(buf, curve.fr, proof.c)
    write_opt_tag(buf, proof.hiding_comm is not None)
    if proof.hiding_comm is not None:
        write_point(buf, curve, proof.hiding_comm)
    write_opt_tag(buf, proof.rand is not None)
    if proof.rand is not None:
        write_scalars(buf, curve.fr, proof.rand)
    return buf.getvalue()


def deserialize_ipa_proof(curve: CurveSpec, data: bytes):
    from ..pc import ipa_pc
    buf = io.BytesIO(data)
    k = read_usize(buf)
    if k:
        l_vec = read_points(buf, curve, k)
        r_vec = read_points(buf, curve, k)
    else:
        l_vec = wst.affine_zero(curve, (0,))
        r_vec = wst.affine_zero(curve, (0,))
    final_key = read_point(buf, curve)
    c = read_scalars(buf, curve.fr, ())
    hiding_comm = read_point(buf, curve) if read_opt_tag(buf) else None
    rand = read_scalars(buf, curve.fr, ()) if read_opt_tag(buf) else None
    return ipa_pc.Proof(l_vec, r_vec, final_key, c, hiding_comm, rand)


def serialize_ipa_accumulator(curve: CurveSpec, acc) -> bytes:
    """ipa_pc_as accumulator (atomic: instance only) -> bytes."""
    buf = io.BytesIO()
    inst = acc.instance
    write_point(buf, curve, inst.ipa_commitment)
    write_scalars(buf, curve.fr, inst.point)
    write_scalars(buf, curve.fr, inst.evaluation)
    proof_bytes = serialize_ipa_proof(curve, inst.ipa_proof)
    write_usize(buf, len(proof_bytes))
    buf.write(proof_bytes)
    return buf.getvalue()


def deserialize_ipa_accumulator(curve: CurveSpec, data: bytes):
    from ..core.accumulation import InstanceWitnessPair
    from ..schemes import ipa_pc_as
    buf = io.BytesIO(data)
    comm = read_point(buf, curve)
    point = read_scalars(buf, curve.fr, ())
    evaluation = read_scalars(buf, curve.fr, ())
    plen = read_usize(buf)
    proof = deserialize_ipa_proof(curve, buf.read(plen))
    inst = ipa_pc_as.InputInstance(comm, point, evaluation, proof)
    return InstanceWitnessPair(inst, None)


def serialized_size(data: bytes) -> int:
    return len(data)
