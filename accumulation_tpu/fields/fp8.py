"""Exact float32 field arithmetic on redundant 8-bit limbs — the TPU MSM
engine.

Why floats: the TPU VPU has no native 32-bit integer multiplier; XLA
emulates every uint32 multiply, and the u32 limb engine measured ~3 G
emulated mults/s (experiments/profile_out.txt) — far under the chip's f32
throughput.  f32 multiply-adds are IEEE-exact whenever every intermediate
fits the 24-bit mantissa, so 8-bit limbs with bounded redundancy give exact
field arithmetic at float speed.

Design (this file replaces an earlier 2x16-limb f32 engine whose sequential
per-limb carry chains produced megascale XLA graphs that never finished
compiling on the remote TPU toolchain):

  * REDUNDANT representation: ``NL8(spec)`` f32 limbs, radix 256, stored
    lane-major ``(nl8, ...batch)``; public ops keep every limb <= ~260
    (canonical would be <= 255) and element VALUES in [0, ~1.01p + small).
    Values are plain integers — no wraparound — so all carry handling is
    local.
  * OVERSIZED Montgomery radix: R8 = 2^(8*nl8) with nl8 = ceil((bits+56)/8)
    (39 limbs / R8 = 2^312 for 255-bit fields).  Because R8 >= 2^56 * p,
    Montgomery outputs stay < 1.01p with NO conditional subtraction — the
    hot loop contains zero sequential chains.
  * Convolutions via the exact skew-reshape reduction (same trick as the
    u32 engine, fields/fp.py:_skew_diag_sums, transposed to the lane-major
    layout): pad / reflatten / one tree sum — 3 wide VPU ops, no
    dynamic-update-slice chains.
  * Carries as VECTORIZED passes: one pass = split v into (lo, hi) and add
    hi shifted one limb up — 4 elementwise ops over the whole limb tensor;
    3 passes bring post-convolution columns (< 2^25) down to limbs <= 258.
  * REDC low-half carry WITHOUT sequential propagation: the low half of
    T + q*p is an exact multiple of R8, so its carry-out is an integer we
    only need to within +-0.5; the top three columns evaluated in f32 give
    it exactly (error < 0.1), one rounding recovers it.

Bounds (proofs in comments):  operands <= 260 limb-wise =>
39 * 260^2 < 2^24 mantissa-exact column sums; mul output <= 258;
add = limb add + 1 pass (<= 259); sub adds a limb-wise-large multiple of p
(precomputed) then 1 pass.

Reference role: the arkworks `ark-ec` MSM inner loops
(/root/reference/src/hp_as/mod.rs:196-214,377 call sites).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fp import FieldSpec, DTYPE as U32, LIMB_BITS

F32 = jnp.float32
INV256 = float(2.0 ** -8)


# ---------------------------------------------------------------------------
# spec constants (cached per field, all host-side numpy)
# ---------------------------------------------------------------------------


def _split8_int(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)],
                    dtype=np.float32)


@functools.lru_cache(maxsize=None)
def consts8(spec: FieldSpec):
    """Redundant-engine constants for `spec`.

    Returns dict with: nl8, p8 (canonical limbs of p), pp8 (-p^-1 mod R8),
    r8_mod_p (fp8-Montgomery one), to8_f (R8^2 / R mod p, plain limbs),
    from8_f (R mod p, plain limbs), sub_pad (limb-wise-large multiple of p).
    """
    p = spec.modulus
    bits = p.bit_length()
    nl8 = -(-(bits + 56) // 8)  # R8 >= 2^56 * p
    R8 = 1 << (8 * nl8)
    R = 1 << (LIMB_BITS * spec.nlimbs)  # the u32 engine's radix
    pp8 = (-pow(p, -1, R8)) % R8
    to8_f = (R8 * R8 % p) * pow(R, -1, p) % p
    from8_f = R % p

    # sub_pad: a multiple of p whose limbs dominate any minuend's (so a - b
    # + pad stays limb-wise non-negative) while its VALUE stays ~64p (far
    # below R8, so Montgomery bounds hold).  Only limbs 0..nz-1 can be
    # nonzero in a bounded operand (values < ~8p => limb i <= value/256^i);
    # build k*p with k ~ 2^6 and redistribute value downward
    # (limb[i] += 256*t, limb[i+1] -= t) until limbs 0..nz-1 >= 304.
    nz = bits // 8 + 1  # highest possibly-nonzero limb of a <8p value
    k = (1 << (8 * nz + 6)) // p + 1
    kp = k * p
    limbs = [(kp >> (8 * i)) & 0xFF for i in range(nl8)]
    limbs[nz] = kp >> (8 * nz)  # collapse the top into limb nz
    for i in range(nz + 1, nl8):
        limbs[i] = 0
    for i in range(nz - 1, -1, -1):
        # target 310: the limb below may still borrow up to 2 afterwards
        need = max(0, -(-(310 - limbs[i]) // 256))
        limbs[i] += 256 * need
        limbs[i + 1] -= need
    assert all(304 <= limbs[i] <= 1100 for i in range(nz)), limbs
    assert limbs[nz] >= 16, limbs  # still dominates limb nz of a <8p value
    assert sum(l << (8 * i) for i, l in enumerate(limbs)) == kp
    sub_pad = np.array(limbs, dtype=np.float32)

    return {
        "nl8": nl8,
        "p8": _split8_int(p, nl8),
        "pp8": _split8_int(pp8, nl8),
        "one8": _split8_int(R8 % p, nl8),
        "to8_f": _split8_int(to8_f, nl8),
        "from8_f": _split8_int(from8_f, nl8),
        "sub_pad": sub_pad,
    }


def NL8(spec: FieldSpec) -> int:
    return consts8(spec)["nl8"]


def _const(arr: np.ndarray, ndim: int):
    c = jnp.asarray(arr, F32)
    return c.reshape((c.shape[0],) + (1,) * (ndim - 1))


# --- constant override context (Pallas kernels) ----------------------------
# Pallas kernel bodies may not close over materialised constants; a kernel
# passes its constant rows in as inputs and installs them here for the
# duration of its trace (single-threaded tracing — a plain global is fine).
_OVERRIDE = {}


class override_consts:
    """with fp8.override_consts({'p8': ref_row, ...}): ... kernel body ..."""

    def __init__(self, mapping):
        self.mapping = mapping

    def __enter__(self):
        _OVERRIDE.update(self.mapping)
        return self

    def __exit__(self, *exc):
        for k in self.mapping:
            _OVERRIDE.pop(k, None)
        return False


def _getc(spec: FieldSpec, name: str, ndim: int):
    ov = _OVERRIDE.get(name)
    if ov is not None:
        return ov.reshape((ov.shape[-1],) + (1,) * (ndim - 1))
    return _const(consts8(spec)[name], ndim)


def get_override(name: str):
    return _OVERRIDE.get(name)


# ---------------------------------------------------------------------------
# carry machinery — all vectorized, no per-limb loops
# ---------------------------------------------------------------------------


def _pass(v):
    """One carry pass: limbs' = (v mod 256) + shift_up(v div 256).

    Magnitude shrinks ~256x per pass.  The top carry is dropped — callers
    guarantee it is zero (value bound << R8) or work mod R8."""
    hi = jnp.floor(v * INV256)
    lo = v - hi * 256.0
    return lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)


def _norm3(v):
    """Columns < 2^25 -> limbs <= 258 (3 passes)."""
    return _pass(_pass(_pass(v)))


# ---------------------------------------------------------------------------
# exact skew-reshape convolution (lane-major: limb axis leading)
# ---------------------------------------------------------------------------


def _skew_sum(prod):
    """Anti-diagonal sums: (n, n, ...batch) -> (2n-1, ...batch).

    Row r padded to width 2n and reflattened to width 2n-1 lands shifted by
    r (index algebra r*2n + c == r*(2n-1) + (r+c)), so one sum over the row
    axis yields col[k] = sum_{i+j=k} prod[i, j].  Exact: each column sums
    <= n f32 values < 2^19 -> < 2^25 < f32 exact-integer range for sums of
    integers... (products < 260^2 < 2^17, n <= 55 terms -> < 2^23)."""
    n = prod.shape[0]
    rest = prod.shape[2:]
    padded = jnp.concatenate(
        [prod, jnp.zeros((n, n) + rest, prod.dtype)], axis=1)  # (n, 2n, ...)
    flat = padded.reshape((2 * n * n,) + rest)[: n * (2 * n - 1)]
    skewed = flat.reshape((n, 2 * n - 1) + rest)
    return jnp.sum(skewed, axis=0)


def _conv_full(a, b):
    """Full product columns: (n, ...) x (n, ...) -> (2n, ...)."""
    n = a.shape[0]
    prod = a[:, None] * b[None, :]  # (n, n, ...)
    cols = _skew_sum(prod)  # (2n-1, ...)
    return jnp.concatenate(
        [cols, jnp.zeros((1,) + cols.shape[1:], cols.dtype)], axis=0)


# ---------------------------------------------------------------------------
# public ops — redundant fp8-Montgomery representation
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a, b):
    """Limb add + one pass (limbs <= 259)."""
    return _pass(a + b)


def sub(spec: FieldSpec, a, b):
    """a - b + (limb-wise-large multiple of p) + two passes.

    Two passes (not one) so the <= 256 limb invariant holds: 256 is the
    largest integer exactly representable in bfloat16, which the MXU mul
    path relies on."""
    pad = _getc(spec, "sub_pad", a.ndim)
    return _pass(_pass(a - b + pad))


# ---------------------------------------------------------------------------
# MXU mul path: the convolutions as exact bf16 matmuls
# ---------------------------------------------------------------------------
#
# Every convolution in REDC is linear in ONE data operand:
#   * T = a (*) b         = SEL @ (rep(a) * tile(b))   — SEL is the constant
#     0/1 anti-diagonal selection matrix over the n^2 products;
#   * q = (t_low * p') lo = Toeplitz_low(p') @ t_low;
#   * q*p                 = Toeplitz(p) @ q.
# With the <= 256 limb invariant, all matrix entries and (hi, lo) product
# splits are exact in bfloat16, products are exact in the MXU's f32
# accumulation, and every column sum stays < 2^24 — the whole field
# multiply becomes 4 small exact matmuls, which is both what the TPU's
# systolic array is for and what Mosaic compiles well (the skew-reshape
# VPU formulation below blew up Pallas compile times).


@functools.lru_cache(maxsize=None)
def mxu_mats(spec: FieldSpec):
    """(SEL (2n, n*n), Tq (n, n), Tp (2n, n)) float32 numpy (bf16-exact)."""
    cs = consts8(spec)
    n = cs["nl8"]
    sel = np.zeros((2 * n, n * n), np.float32)
    for i in range(n):
        for j in range(n):
            sel[i + j, i * n + j] = 1.0
    pp8, p8 = cs["pp8"], cs["p8"]
    tq = np.zeros((n, n), np.float32)
    tp = np.zeros((2 * n, n), np.float32)
    for k in range(n):
        for i in range(k + 1):
            tq[k, i] = pp8[k - i]
    for k in range(2 * n):
        for i in range(n):
            if 0 <= k - i < n:
                tp[k, i] = p8[k - i]
    return sel, tq, tp


def _bf16_dot(m, v):
    """Exact matmul of a bf16-exact constant matrix with bf16-exact data.

    m: (R, K), v: (K, ...batch) — contracts K, f32 accumulation."""
    vb = v.astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    flat = vb.reshape(vb.shape[0], -1)
    out = jax.lax.dot_general(
        mb, flat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape((m.shape[0],) + v.shape[1:])


def _mul_mxu(spec: FieldSpec, a, b, mats):
    """MXU Montgomery product; same contract as `mul` (limbs <= 256)."""
    sel, tq, tp = mats
    nl8 = consts8(spec)["nl8"]
    ar = jnp.repeat(a, nl8, axis=0)               # row i*n+j = a[i]
    bt = jnp.concatenate([b] * nl8, axis=0)       # row i*n+j = b[j]
    prod = ar * bt                                # <= 2^16, exact f32
    hi = jnp.floor(prod * INV256)                 # <= 256  (bf16-exact)
    lo = prod - hi * 256.0                        # <= 255
    T = _bf16_dot(sel, hi) * 256.0 + _bf16_dot(sel, lo)

    t_low = _norm3(T[:nl8])                       # <= 256, mod R8
    q = _norm3(_bf16_dot(tq, t_low))              # <= 256, mod R8
    qp = _bf16_dot(tp, q)

    u = T[:nl8] + qp[:nl8]
    c_low = jnp.floor(
        u[nl8 - 1] * INV256
        + u[nl8 - 2] * (INV256 ** 2)
        + u[nl8 - 3] * (INV256 ** 3)
        + 0.5)
    hi_cols = T[nl8:] + qp[nl8:]
    hi_cols = jnp.concatenate([(hi_cols[0] + c_low)[None], hi_cols[1:]],
                              axis=0)
    return _norm3(hi_cols)


def mul(spec: FieldSpec, a, b):
    """Montgomery product: value(out) = value(a)*value(b)/R8 mod p,
    out < ~1.01p + eps, limbs <= 256.  No sequential carries.

    When the override context provides "mxu_mats" (Pallas kernels / TPU),
    the convolutions run as exact bf16 matmuls on the MXU; "hybrid_mats"
    selects the roll-conv VPU body for the data*data convolution with the
    two constant REDC convolutions on the MXU (ops/msm_pallas.py)."""
    hy = _OVERRIDE.get("hybrid_mats")
    if hy is not None:
        return _mul_hybrid(spec, a, b, hy)
    mx = _OVERRIDE.get("mxu_mats")
    if mx is not None:
        return _mul_mxu(spec, a, b, mx)
    return _mul_vpu(spec, a, b)


# ---------------------------------------------------------------------------
# hybrid Pallas mul path: VPU roll-conv for a*b, MXU for the constant convs
# ---------------------------------------------------------------------------
#
# The MXU SEL formulation above computes T = a (*) b as a (2n, n^2) matmul —
# 78x the useful multiply work at n = 39 (measured structurally capped,
# see ops/msm_pallas.py).  But ONLY the data*data convolution needs SEL; the
# other two REDC convolutions contract against CONSTANT Toeplitz matrices
# (Tq: n^2 MACs, Tp: 2n^2 — no amplification at all).  This path computes T
# with exactly the useful n^2 f32 FMAs on the VPU via a roll-accumulate
# loop, and keeps q / q*p on the MXU — the two units run concurrently.
#
# Roll-conv correctness: maintain U_i = rollup(T_i, i) (cyclic row shift of
# the partial conv by i) over a (2n, ...) buffer.  Then
#   U_i = roll(U_{i-1}, -1) + [a_i * b ; 0]
# adds term i at rows 0..n-1 (= T rows i..i+n-1), and T = roll(U_{n-1}, n-1).
# T's support is 2n-1 rows in a 2n buffer, so the cyclic roll never aliases.
# Exactness: products <= 260^2 < 2^17, column sums <= n terms -> < 2^23,
# all integers — exact in f32 (same bound as _skew_sum).
#
# pltpu.roll is a Mosaic sublane rotate — only available inside Pallas
# kernel traces (and the interpreter), which is the only place this path is
# dispatched from.


def _conv_roll(a, b):
    """Exact full conv columns via roll-accumulate: (n, ...) x (n, ...) ->
    (2n, ...).  Pallas-kernel-only (uses pltpu.roll)."""
    from jax.experimental.pallas import tpu as pltpu
    n = a.shape[0]
    rest = a.shape[1:]
    zpad = jnp.zeros((n,) + rest, F32)

    def body(_, carry):
        a_rot, u = carry
        term = a_rot[0:1] * b
        # roll by -1 (shift rows up); pltpu.roll wants non-negative shifts,
        # and -1 == size-1 (mod size)
        u = pltpu.roll(u, 2 * n - 1, 0) + jnp.concatenate([term, zpad],
                                                          axis=0)
        return (pltpu.roll(a_rot, n - 1, 0), u)

    _, u = jax.lax.fori_loop(
        0, n, body, (a, jnp.zeros((2 * n,) + rest, F32)))
    return pltpu.roll(u, n - 1, 0)


def _mul_hybrid(spec: FieldSpec, a, b, mats):
    """Same contract as `mul`; T on the VPU, q / q*p on the MXU."""
    tq, tp = mats
    nl8 = consts8(spec)["nl8"]
    T = _conv_roll(a, b)                      # (2n, ...), exact integers

    t_low = _norm3(T[:nl8])                   # <= 256, mod R8
    q = _norm3(_bf16_dot(tq, t_low))          # <= 256, mod R8
    qp = _bf16_dot(tp, q)

    u = T[:nl8] + qp[:nl8]
    c_low = jnp.floor(
        u[nl8 - 1] * INV256
        + u[nl8 - 2] * (INV256 ** 2)
        + u[nl8 - 3] * (INV256 ** 3)
        + 0.5)
    hi_cols = T[nl8:] + qp[nl8:]
    hi_cols = jnp.concatenate([(hi_cols[0] + c_low)[None], hi_cols[1:]],
                              axis=0)
    return _norm3(hi_cols)


def _mul_vpu(spec: FieldSpec, a, b):
    """Skew-reshape VPU formulation (XLA / CPU path)."""
    nl8 = consts8(spec)["nl8"]
    T = _conv_full(a, b)  # (2n, ...), columns < 2^23

    t_low = _norm3(T[:nl8])  # mod R8 (top carries dropped — allowed)
    ppc = _getc(spec, "pp8", t_low.ndim)
    q_prod = t_low[:, None] * ppc[None, :]  # (n, n, ...)
    # q = (t_low * p') mod R8: full skew then truncate to n columns
    q_cols = _skew_sum(q_prod)[:nl8]
    q = _norm3(q_cols)  # limbs <= 258, value < 1.008*R8

    pc = _getc(spec, "p8", q.ndim)
    qp = _conv_full(q, jnp.broadcast_to(pc, q.shape))  # (2n, ...)

    # exact low-half carry: (T + q*p) mod R8 == 0, so the carry into limb n
    # is an integer; the top three low columns give it to error < 0.1
    u = T[:nl8] + qp[:nl8]
    c_low = jnp.floor(
        u[nl8 - 1] * INV256
        + u[nl8 - 2] * (INV256 ** 2)
        + u[nl8 - 3] * (INV256 ** 3)
        + 0.5)

    hi = T[nl8:] + qp[nl8:]
    # concat, not .at[].add — scatter-add has no Mosaic (Pallas TPU) lowering
    hi = jnp.concatenate([(hi[0] + c_low)[None], hi[1:]], axis=0)
    return _norm3(hi)


def square(spec: FieldSpec, a):
    return mul(spec, a, a)


def zero(spec: FieldSpec, shape=()):
    return jnp.zeros((NL8(spec),) + shape, F32)


def one(spec: FieldSpec, shape=()):
    cs = consts8(spec)
    o = jnp.asarray(cs["one8"], F32)
    return jnp.broadcast_to(
        o.reshape((cs["nl8"],) + (1,) * len(shape)), (cs["nl8"],) + shape)


def const8(spec: FieldSpec, x: int, ndim: int):
    """Plain python int -> broadcastable fp8-Montgomery constant."""
    cs = consts8(spec)
    R8 = 1 << (8 * cs["nl8"])
    return _const(_split8_int(x * R8 % spec.modulus, cs["nl8"]), ndim)


# ---------------------------------------------------------------------------
# u32 (16-bit-limb Montgomery) <-> fp8 boundary conversions
# ---------------------------------------------------------------------------


def _resplit_u32_to8(spec: FieldSpec, a):
    """(..., n32) u32 limbs -> (nl8, ...) f32 limbs of the same VALUE."""
    nl8 = NL8(spec)
    lo = (a & 0xFF).astype(F32)
    hi = ((a >> 8) & 0xFF).astype(F32)
    inter = jnp.stack([lo, hi], axis=-1).reshape(
        *a.shape[:-1], 2 * a.shape[-1])
    moved = jnp.moveaxis(inter, -1, 0)  # (2*n32, ...)
    pad = nl8 - moved.shape[0]
    assert pad >= 0
    return jnp.concatenate(
        [moved, jnp.zeros((pad,) + moved.shape[1:], F32)], axis=0)


def to8(spec: FieldSpec, a):
    """u32-Montgomery (..., n32) -> fp8-Montgomery (nl8, ...).

    One fp8 mul: value xR (plain) times (R8^2/R mod p) over R8 = x*R8."""
    cs = consts8(spec)
    plain = _resplit_u32_to8(spec, a)
    return mul(spec, plain, jnp.broadcast_to(
        _const(cs["to8_f"], plain.ndim), plain.shape))


def from8(spec: FieldSpec, a):
    """fp8-Montgomery (nl8, ...) -> u32-Montgomery (..., n32), canonical.

    mul by (R mod p) unwraps to value x*R as redundant limbs (< 1.01p + p);
    a final sequential carry + up to 2 conditional subtracts canonicalise —
    only used at kernel boundaries (3 coordinates per MSM)."""
    cs = consts8(spec)
    nl8 = cs["nl8"]
    t = mul(spec, a, jnp.broadcast_to(
        _const(cs["from8_f"], a.ndim), a.shape))  # value = xR + kp, k<=1.01

    # canonical carry (sequential, boundary-only)
    limbs = []
    carry = jnp.zeros(t.shape[1:], F32)
    for i in range(nl8):
        v = t[i] + carry
        carry = jnp.floor(v * INV256)
        limbs.append(v - carry * 256.0)
    canon = jnp.stack(limbs, axis=0)

    p8 = _const(cs["p8"], canon.ndim)
    for _ in range(2):  # value < ~2.02p -> canonical after <= 2 subtracts
        borrow = jnp.zeros(canon.shape[1:], F32)
        out = []
        for i in range(nl8):
            v = canon[i] - p8[i] + borrow
            borrow = jnp.floor(v * INV256)  # 0 or -1
            out.append(v - borrow * 256.0)
        diff = jnp.stack(out, axis=0)
        keep = (borrow < 0)[None]
        canon = jnp.where(keep, canon, diff)

    # repack 8-bit limbs -> 16-bit u32 limbs
    n32 = spec.nlimbs
    moved = jnp.moveaxis(canon[: 2 * n32], 0, -1).astype(U32)
    pairs = moved.reshape(*moved.shape[:-1], n32, 2)
    return pairs[..., 0] | (pairs[..., 1] << 8)
