"""Exact f32 field arithmetic on 8-bit limbs — the TPU fast path.

Why: the TPU VPU has no native 32-bit integer multiplier; XLA emulates every
uint32 multiply, and the measured throughput of the u32 limb engine is ~3
G-mults/s (profiled on v5e, experiments/profile_out.txt) — orders of
magnitude under the chip's float throughput.  Float32 multiplies, by
contrast, run at full VPU rate and are IEEE-exact whenever the product fits
the 24-bit mantissa.

Representation: an n-limb Montgomery element (radix 2^16, fields/fp.py)
resplit into 2n limbs of 8 bits, stored as f32 in lane-major layout
``(2n, ...batch)``.  All values are integers:

  * canonical limbs are in [0, 255];
  * an 8x8-bit partial product is <= 2^16, and a convolution column sums at
    most 2n <= 48 of them: < 2^22 < 2^24 — exact in f32;
  * carry propagation uses floor(v / 256) (exact for |v| < 2^24, and floor
    handles negative borrows for free).

Montgomery R stays 2^(16 n) — identical to the u32 engine — so conversion
between engines is a pure limb resplit; REDC is the same algorithm.
Same role as fields/fp_lanes.py (lane-major batch in the VPU lanes), with
every multiply ~10-30x cheaper.  This is the engine under the throughput
kernels (ops/msm.py lane path); reference MSM role: arkworks `ark-ec` MSMs
(e.g. call sites /root/reference/src/hp_as/mod.rs:196-214,377).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fp import FieldSpec, LIMB_BITS, LIMB_MASK, DTYPE as U32

F32 = jnp.float32
INV256 = float(2.0 ** -8)


# ---------------------------------------------------------------------------
# spec constants (8-bit limb form, cached per field)
# ---------------------------------------------------------------------------


def _split8(x: int, nl8: int) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(nl8)],
                    dtype=np.float32)


@functools.lru_cache(maxsize=None)
def consts8(spec: FieldSpec):
    """(nl8, p8, pprime8) numpy f32 arrays for this field."""
    nl8 = 2 * spec.nlimbs
    R = 1 << (LIMB_BITS * spec.nlimbs)
    pprime = (-pow(spec.modulus, -1, R)) % R
    return nl8, _split8(spec.modulus, nl8), _split8(pprime, nl8)


def _const(arr: np.ndarray, ref):
    c = jnp.asarray(arr, F32)
    return c.reshape((c.shape[0],) + (1,) * (ref.ndim - 1))


# ---------------------------------------------------------------------------
# u32 (16-bit limbs, trailing axis) <-> f32 (8-bit limbs, leading axis)
# ---------------------------------------------------------------------------


def to8(a):
    """(..., n) uint32 16-bit limbs -> (2n, ...) f32 8-bit limbs."""
    lo = (a & 0xFF).astype(F32)
    hi = ((a >> 8) & 0xFF).astype(F32)
    inter = jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1],
                                                 2 * a.shape[-1])
    return jnp.moveaxis(inter, -1, 0)


def from8(a):
    """(2n, ...) f32 canonical 8-bit limbs -> (..., n) uint32 16-bit limbs."""
    moved = jnp.moveaxis(a, 0, -1).astype(U32)
    nl8 = moved.shape[-1]
    pairs = moved.reshape(*moved.shape[:-1], nl8 // 2, 2)
    return pairs[..., 0] | (pairs[..., 1] << 8)


# ---------------------------------------------------------------------------
# carry machinery (all exact in f32)
# ---------------------------------------------------------------------------


def _carry(cols, out_limbs=None):
    """Normalise (m, ...) integer-valued f32 columns (|v| < 2^24) to 8-bit
    limbs; returns (limbs, carry_out).  floor-based: works for negatives."""
    m = cols.shape[0]
    out = out_limbs if out_limbs is not None else m
    limbs = []
    carry = jnp.zeros(cols.shape[1:], F32)
    for i in range(m):
        v = cols[i] + carry
        carry = jnp.floor(v * INV256)
        if i < out:
            limbs.append(v - carry * 256.0)
    return jnp.stack(limbs[:out], axis=0), carry


def _cond_sub_p(spec: FieldSpec, a):
    """One conditional subtract of p (canonicalises a < 2p)."""
    nl8, p8, _ = consts8(spec)
    p = _const(p8, a)
    limbs = []
    borrow = jnp.zeros(a.shape[1:], F32)
    for i in range(nl8):
        v = a[i] - p[i] + borrow
        borrow = jnp.floor(v * INV256)   # 0 or -1
        limbs.append(v - borrow * 256.0)
    diff = jnp.stack(limbs, axis=0)
    keep = (borrow < 0)[None]            # borrowed: a < p, keep a
    return jnp.where(keep, a, diff)


# ---------------------------------------------------------------------------
# public ops — all take/return canonical 8-bit-limb Montgomery f32 tensors
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a, b):
    s, _ = _carry(a + b)   # a + b < 2p < R, carry out is 0
    return _cond_sub_p(spec, s)


def sub(spec: FieldSpec, a, b):
    nl8, p8, _ = consts8(spec)
    p = _const(p8, a)
    s, _ = _carry(a - b + p)  # in (0, 2p)
    return _cond_sub_p(spec, s)


def neg(spec: FieldSpec, a):
    nl8, p8, _ = consts8(spec)
    p = _const(p8, a)
    s, _ = _carry(p - a)
    is_zero_a = is_zero(a)
    return jnp.where(is_zero_a[None], jnp.zeros_like(a), s)


def _conv_full(a, b):
    """Full convolution: (n, ...) x (n, ...) -> (2n, ...) column sums.

    Exact: products <= 2^16, <= n <= 48 summands per column < 2^22."""
    n = a.shape[0]
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    cols = jnp.zeros((2 * n,) + shape, F32)
    for i in range(n):
        cols = cols.at[i:i + n].add(a[i][None] * b)
    return cols


def _conv_low(a, b_const):
    """Low-half convolution (mod 2^(8n)) against a constant (n,) vector."""
    n = a.shape[0]
    cols = jnp.zeros((n,) + a.shape[1:], F32)
    for i in range(n):
        k = n - i
        cols = cols.at[i:].add(a[i][None] * b_const[:k])
    return cols


def mul(spec: FieldSpec, a, b):
    """Montgomery product (aR)(bR) -> abR, all-f32."""
    nl8, p8, pp8 = consts8(spec)
    cols = _conv_full(a, b)                       # (2n, ...)
    t_low, carry_mid = _carry(cols[:nl8])         # exact T mod R + carry
    ppc = _const(pp8, t_low)
    q_cols = _conv_low(t_low, ppc)
    q, _ = _carry(q_cols)                         # q = T*p' mod R
    pc = _const(p8, q)
    qp = _conv_full(q, jnp.broadcast_to(pc, q.shape))
    # low half of T + q*p is divisible by R; recover its carry-out
    _, carry_low = _carry(t_low + qp[:nl8])
    hi = cols[nl8:] + qp[nl8:]
    hi = hi.at[0].add(carry_low + carry_mid)
    out, _ = _carry(hi)
    return _cond_sub_p(spec, out)


def square(spec: FieldSpec, a):
    return mul(spec, a, a)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def zero(spec: FieldSpec, shape=()):
    return jnp.zeros((2 * spec.nlimbs,) + shape, F32)


def one(spec: FieldSpec, shape=()):
    nl8 = 2 * spec.nlimbs
    o = _split8(spec.r_mod_p, nl8)
    return jnp.broadcast_to(
        jnp.asarray(o, F32).reshape((nl8,) + (1,) * len(shape)),
        (nl8,) + shape)


def const_from_mont_u32(limbs_u32: np.ndarray, ref):
    """numpy (n,) uint32 16-bit Montgomery limbs -> (2n, 1...) f32 constant."""
    x = np.asarray(limbs_u32)
    lo = (x & 0xFF).astype(np.float32)
    hi = ((x >> 8) & 0xFF).astype(np.float32)
    inter = np.stack([lo, hi], axis=-1).reshape(2 * x.shape[-1])
    return _const(inter, ref)
