"""Float32 limb engine: exact field arithmetic on native f32 VPU ops.

The TPU VPU has no native 32-bit integer multiply — XLA emulates uint32
multiplies in many instructions, which measurement shows dominates the group
-op kernels.  f32 multiply/add ARE native and IEEE-exact for integers below
2^24, so this engine represents field elements as 29 limbs of 9 bits in
float32:

  * partial products: (2^9-1)^2 < 2^18, column sums of <= 29 terms < 2^23;
  * REDC accumulation T + q*p stays < 2^24 per column — exact;
  * carries via floor(x * (1/512)) (exact: operands < 2^24).

Montgomery radix here is R' = 2^261 (29 * 9 bits); conversion from the
uint32 engine's R = 2^256 form multiplies by the precomputed constant
(2^5 R' mod p) under REDC'.  The engine mirrors fp.py's op surface for the
hot path (add/sub/mul/square) plus conversions, and is validated limb-exactly
against the uint32 engine (tests/test_fp32.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from accumulation_tpu.fields import fp
from accumulation_tpu.fields.fp import FieldSpec

LIMB_BITS = 9
NLIMBS = 29  # 29 * 9 = 261 bits
BASE = 1 << LIMB_BITS
INV_BASE = 1.0 / BASE
DTYPE = jnp.float32


def int_to_limbs9(x: int) -> np.ndarray:
    assert 0 <= x < (1 << (LIMB_BITS * NLIMBS))
    return np.array([(x >> (LIMB_BITS * i)) & (BASE - 1)
                     for i in range(NLIMBS)], dtype=np.float32)


def limbs9_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    return sum(int(limbs[i]) << (LIMB_BITS * i) for i in range(NLIMBS))


@dataclass(frozen=True, eq=False)
class F32Spec:
    """Derived f32-engine constants for a FieldSpec."""

    base: FieldSpec
    p_limbs: np.ndarray
    pprime_limbs: np.ndarray   # -p^-1 mod 2^261, low 29 9-bit limbs
    r2_limbs: np.ndarray       # (R'^2 mod p) in 9-bit limbs
    to_engine_limbs: np.ndarray    # 2^5 * R' mod p  (uint-Mont -> f32-Mont factor)
    from_engine_limbs: np.ndarray  # 2^{256} mod p ... see to_uint32


@functools.lru_cache(maxsize=None)
def make_f32(spec: FieldSpec) -> F32Spec:
    p = spec.modulus
    Rp = 1 << (LIMB_BITS * NLIMBS)  # 2^261
    pprime = (-pow(p, -1, Rp)) % Rp
    r2 = (Rp * Rp) % p
    # converting a*2^256 (uint Mont) to a*2^261 (f32 Mont):
    #   REDC'(x * c) = x * c / 2^261; want a*2^261 from x = a*2^256:
    #   c = 2^261 * 2^261 / 2^256 = 2^266 mod p
    to_engine = pow(2, 266, p)
    # converting y = a*2^261 back to a*2^256: REDC'(y * c') = y*c'/2^261
    #   = a * c' * 2^0 ... want a*2^256: c' = 2^256 mod p
    from_engine = pow(2, 256, p)
    return F32Spec(
        base=spec,
        p_limbs=int_to_limbs9(p),
        pprime_limbs=int_to_limbs9(pprime),
        r2_limbs=int_to_limbs9(r2),
        to_engine_limbs=int_to_limbs9(to_engine),
        from_engine_limbs=int_to_limbs9(from_engine),
    )


def _fjit(fn):
    return jax.jit(fn, static_argnums=0)


# ---------------------------------------------------------------------------
# low-level helpers (all shapes (..., NLIMBS) float32, integer-valued)
# ---------------------------------------------------------------------------


def _carry(cols, n_out=None):
    """Sequential carry normalisation; exact for column values < 2^24."""
    n = cols.shape[-1]
    limbs = []
    carry = jnp.zeros(cols.shape[:-1], DTYPE)
    for i in range(n):
        v = cols[..., i] + carry
        carry = jnp.floor(v * INV_BASE)
        limbs.append(v - carry * BASE)
    out = jnp.stack(limbs, axis=-1)
    if n_out is not None and n_out != n:
        out = out[..., :n_out]
    return out, carry


def _sub_borrow(a, b):
    """a - b limb-wise with borrow chain; returns (diff, borrow in {0,1})."""
    a, b = jnp.broadcast_arrays(a, b)
    limbs = []
    borrow = jnp.zeros(a.shape[:-1], DTYPE)
    for i in range(a.shape[-1]):
        v = a[..., i] - b[..., i] - borrow
        neg = (v < 0).astype(DTYPE)
        limbs.append(v + neg * BASE)
        borrow = neg
    return jnp.stack(limbs, axis=-1), borrow


def _cond_sub_p(es: F32Spec, a):
    p = jnp.asarray(es.p_limbs)
    diff, borrow = _sub_borrow(a, jnp.broadcast_to(p, a.shape))
    return jnp.where((borrow == 0)[..., None], diff, a)


def _skew_diag_sums(mat):
    """Anti-diagonal sums of (..., n, n) -> (..., 2n-1); exact f32 adds."""
    n = mat.shape[-1]
    batch = mat.shape[:-2]
    padded = jnp.concatenate(
        [mat, jnp.zeros(batch + (n, n), dtype=mat.dtype)], axis=-1)
    flat = padded.reshape(*batch, 2 * n * n)[..., : n * (2 * n - 1)]
    return jnp.sum(flat.reshape(*batch, n, 2 * n - 1), axis=-2)


def _wide_cols(a, b):
    """Column sums of the full product (..., 2*NLIMBS-1); values < 2^23."""
    prod = a[..., :, None] * b[..., None, :]  # exact: < 2^18
    return _skew_diag_sums(prod)


# ---------------------------------------------------------------------------
# public ops (Montgomery form, R' = 2^261)
# ---------------------------------------------------------------------------


def _add_raw(es: F32Spec, a, b):
    s, carry = _carry(a + b)
    # a + b < 2p < 2^256 << 2^261, carry-out 0
    return _cond_sub_p(es, s)


def _sub_raw(es: F32Spec, a, b):
    diff, borrow = _sub_borrow(a, b)
    p = jnp.asarray(es.p_limbs)
    readd, _ = _carry(diff + jnp.broadcast_to(p, diff.shape))
    return jnp.where((borrow == 1)[..., None], readd, diff)


add = _fjit(_add_raw)
sub = _fjit(_sub_raw)


def _mul_raw(es: F32Spec, a, b):
    """Montgomery product, no jit wrapper (for fusion in callers)."""
    cols = _wide_cols(a, b)  # (..., 57), < 2^23
    t_low, carry16 = _carry(cols[..., :NLIMBS])
    # q = T_low * p' mod R'
    ppr = jnp.asarray(es.pprime_limbs)
    qcols = _wide_cols(t_low, jnp.broadcast_to(ppr, t_low.shape))
    q, _ = _carry(qcols[..., :NLIMBS])
    # T + q*p
    p = jnp.asarray(es.p_limbs)
    qp = _wide_cols(q, jnp.broadcast_to(p, q.shape))  # (..., 57)
    low_total = t_low + qp[..., :NLIMBS]
    _, carry_low = _carry(low_total)
    hi = cols[..., NLIMBS:] + qp[..., NLIMBS:]  # (..., 28 cols) < 2^24
    hi = jnp.concatenate(
        [hi, jnp.zeros(hi.shape[:-1] + (1,), DTYPE)], axis=-1)
    hi = hi.at[..., 0].add(carry_low + carry16)
    out, _ = _carry(hi)
    return _cond_sub_p(es, out)


mul = _fjit(_mul_raw)


@_fjit
def square(es: F32Spec, a):
    return _mul_raw(es, a, a)


@_fjit
def neg(es: F32Spec, a):
    p = jnp.asarray(es.p_limbs)
    diff, _ = _sub_borrow(jnp.broadcast_to(p, a.shape), a)
    is_zero = jnp.all(a == 0, axis=-1)
    return jnp.where(is_zero[..., None], jnp.zeros_like(a), diff)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


# ---------------------------------------------------------------------------
# conversions uint32-engine <-> f32-engine (both Montgomery)
# ---------------------------------------------------------------------------


@_fjit
def from_uint32(es: F32Spec, a_u32):
    """(..., 16) uint32 16-bit limbs (R=2^256 Mont) -> f32 9-bit (R'=2^261)."""
    # repack bits 16 -> 9: via integer arithmetic on int32 (host-style shifts)
    a = a_u32.astype(jnp.int32)
    bits = []
    for i in range(256):
        limb, off = divmod(i, 16)
        bits.append((a[..., limb] >> off) & 1)
    limbs = []
    for li in range(NLIMBS):
        acc = jnp.zeros(a.shape[:-1], jnp.int32)
        for bi in range(LIMB_BITS):
            idx = li * LIMB_BITS + bi
            if idx < 256:
                acc = acc + (bits[idx] << bi)
        limbs.append(acc)
    x = jnp.stack(limbs, axis=-1).astype(DTYPE)
    te = jnp.asarray(es.to_engine_limbs)
    return _mul_raw(es, x, jnp.broadcast_to(te, x.shape))


@_fjit
def to_uint32(es: F32Spec, a_f32):
    """f32 engine (R'=2^261) -> (..., 16) uint32 16-bit limbs (R=2^256)."""
    fe = jnp.asarray(es.from_engine_limbs)
    x = _mul_raw(es, a_f32, jnp.broadcast_to(fe, a_f32.shape))
    xi = x.astype(jnp.int32)
    bits = []
    for i in range(256):
        limb, off = divmod(i, LIMB_BITS)
        bits.append((xi[..., limb] >> off) & 1)
    limbs = []
    for li in range(16):
        acc = jnp.zeros(x.shape[:-1], jnp.int32)
        for bi in range(16):
            idx = li * 16 + bi
            if idx < 256:
                acc = acc + (bits[idx] << bi)
        limbs.append(acc)
    return jnp.stack(limbs, axis=-1).astype(jnp.uint32)
