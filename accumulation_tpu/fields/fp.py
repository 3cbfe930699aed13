"""TPU-native prime-field arithmetic on limb-decomposed integer tensors.

This is layer L1 of the framework (see SURVEY.md §1): the arithmetic substrate
that the reference consumes from `ark-ff` (reference: /root/reference uses
`PrimeField` ops everywhere, e.g. src/hp_as/mod.rs:278-285).  Instead of a
bignum library with per-element scalar code, field elements here are tensors of
shape ``(..., NLIMBS)`` holding 16-bit limbs in ``uint32`` lanes, little-endian,
in Montgomery form (R = 2^256).  Every operation is a pure, jittable JAX
function vectorised over arbitrary leading batch dimensions, so a batch of
field multiplications maps onto the TPU VPU/MXU instead of a host loop.

Design notes (TPU-first):
  * 16-bit limbs: a 16x16-bit product fits exactly in a uint32 lane, so the
    schoolbook partial products need no wide type (TPU has no native u64).
  * Montgomery REDC (not CIOS): REDC needs three wide multiplies but has no
    per-limb sequential multiply/reduce interleaving, which keeps the op graph
    wide and parallel; the only sequential parts are short carry chains.
  * The anti-diagonal "column" reduction of the 16x16 partial-product tensor
    uses an exact integer skew-reshape (pad rows / reflatten / reduce): TPU
    float matmuls round through bf16 passes, so the contraction must stay in
    uint32 VPU ops to be bit-exact.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
NLIMBS = 16  # default limb count: 16 x 16 = 256 bits (fields up to 255 bits)
LIMB_MASK = (1 << LIMB_BITS) - 1
DTYPE = jnp.uint32


def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """Host-side: python int -> (nlimbs,) uint32 limb array (little-endian)."""
    assert 0 <= x < (1 << (LIMB_BITS * nlimbs))
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(nlimbs)], dtype=np.uint32
    )


def limbs_to_int(limbs) -> int:
    """Host-side: (nlimbs,) limb array -> python int (no batch dims)."""
    limbs = np.asarray(limbs)
    assert limbs.ndim == 1
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs))


@dataclass(frozen=True, eq=False)
class FieldSpec:
    """Static description of a prime field; precomputed Montgomery constants.

    All heavyweight values are host numpy constants captured by jitted closures
    (they become XLA constants).  `eq=False` keeps identity hashing so a spec
    can be a static jit argument (make_field caches one instance per field).
    """

    name: str
    modulus: int
    # Limb count for this field (NLIMBS for <= 255-bit fields; e.g. 24 for
    # the 381-bit BLS12-381 base field).  Montgomery R = 2^(16 * nlimbs).
    nlimbs: int = NLIMBS
    # Derived (filled by `make_field`):
    p_limbs: np.ndarray = field(default=None, repr=False)
    pprime_limbs: np.ndarray = field(default=None, repr=False)  # -p^-1 mod 2^256
    r_mod_p: int = 0  # R mod p  (Montgomery one)
    r2_mod_p: int = 0  # R^2 mod p
    one_mont: np.ndarray = field(default=None, repr=False)
    r2_mont: np.ndarray = field(default=None, repr=False)
    zero: np.ndarray = field(default=None, repr=False)
    inv_exp_bits: np.ndarray = field(default=None, repr=False)  # bits of p-2, LE
    # Tonelli-Shanks data (for sqrt): p - 1 = 2^two_adicity * t, t odd
    two_adicity: int = 0
    t_odd: int = 0
    t_bits: np.ndarray = field(default=None, repr=False)  # bits of (t-1)/2
    root_of_unity_mont: np.ndarray = field(default=None, repr=False)

    @property
    def num_bits(self) -> int:
        return self.modulus.bit_length()


def _bits_le(x: int, n: int) -> np.ndarray:
    return np.array([(x >> i) & 1 for i in range(n)], dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def make_field(name: str, modulus: int, nonresidue: int = 5) -> FieldSpec:
    p = modulus
    nlimbs = max(NLIMBS, -(-(p.bit_length() + 1) // LIMB_BITS))
    R = 1 << (LIMB_BITS * nlimbs)
    assert 2 * p < R, "limb count too small for the modulus"
    pprime = (-pow(p, -1, R)) % R
    r_mod_p = R % p
    r2 = (R * R) % p
    two_adicity = 0
    t = p - 1
    while t % 2 == 0:
        t //= 2
        two_adicity += 1
    # generator of the 2-sylow subgroup: nonresidue^t
    g = nonresidue
    while pow(g, (p - 1) // 2, p) != p - 1:
        g += 1
    root = pow(g, t, p)
    spec = FieldSpec(
        name=name,
        modulus=p,
        nlimbs=nlimbs,
        p_limbs=int_to_limbs(p, nlimbs),
        pprime_limbs=int_to_limbs(pprime, nlimbs),
        r_mod_p=r_mod_p,
        r2_mod_p=r2,
        one_mont=int_to_limbs(r_mod_p, nlimbs),
        r2_mont=int_to_limbs(r2, nlimbs),
        zero=np.zeros(nlimbs, dtype=np.uint32),
        inv_exp_bits=_bits_le(p - 2, p.bit_length()),
        two_adicity=two_adicity,
        t_odd=t,
        t_bits=_bits_le((t - 1) // 2, max(t.bit_length(), 1)),
        root_of_unity_mont=int_to_limbs((root * r_mod_p) % p, nlimbs),
    )
    return spec


# ---------------------------------------------------------------------------
# Low-level limb helpers (all shapes (..., NLIMBS) uint32)
# ---------------------------------------------------------------------------


# Carry-chain style.  Unrolled chains let XLA fuse a whole field op into one
# kernel (essential on TPU, where a lax.scan round-trips HBM every tiny step);
# scan-based chains keep traced graphs small (faster compiles — the right
# trade on the CPU test backend).  Default: unroll unless JAX_PLATFORMS
# requests cpu.
import os as _os

UNROLL_CARRIES = _os.environ.get(
    "ACCUM_TPU_UNROLL_CARRIES",
    "0" if "cpu" in _os.environ.get("JAX_PLATFORMS", "") else "1",
) == "1"


def _carry_propagate(cols, out_limbs=None):
    """Sequential carry normalisation: cols (..., n) values < 2^32 -> 16-bit limbs.

    Returns (limbs, carry_out, None).  The chain is n <= 32 dependent steps of
    trivial VPU ops; see UNROLL_CARRIES for the unroll-vs-scan trade.
    """
    n = cols.shape[-1]
    if UNROLL_CARRIES:
        limbs = []
        carry = jnp.zeros(cols.shape[:-1], dtype=DTYPE)
        for i in range(n):
            v = cols[..., i] + carry
            limbs.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        out = jnp.stack(limbs, axis=-1)
    else:
        moved = jnp.moveaxis(cols, -1, 0)

        def body(carry, col):
            v = col + carry
            return v >> LIMB_BITS, v & LIMB_MASK

        carry, limbs = jax.lax.scan(
            body, jnp.zeros(cols.shape[:-1], DTYPE), moved)
        out = jnp.moveaxis(limbs, 0, -1)
    if out_limbs is not None and out_limbs != n:
        out = out[..., :out_limbs]
    return out, carry, None


def _sub_limbs(a, b):
    """a - b with borrow chain; returns (diff_limbs, borrow_out (0/1))."""
    a, b = jnp.broadcast_arrays(a, b)
    if UNROLL_CARRIES:
        limbs = []
        borrow = jnp.zeros(a.shape[:-1], dtype=DTYPE)
        for i in range(a.shape[-1]):
            v = a[..., i] - b[..., i] - borrow
            limbs.append(v & LIMB_MASK)
            borrow = (v >> 31) & 1
        return jnp.stack(limbs, axis=-1), borrow
    am = jnp.moveaxis(a, -1, 0)
    bm = jnp.moveaxis(b, -1, 0)

    def body(borrow, ab):
        ai, bi = ab
        v = ai - bi - borrow
        return (v >> 31) & 1, v & LIMB_MASK

    borrow, limbs = jax.lax.scan(
        body, jnp.zeros(a.shape[:-1], DTYPE), (am, bm)
    )
    return jnp.moveaxis(limbs, 0, -1), borrow


def _geq(a, b):
    """a >= b comparing (..., n) limb arrays as integers -> bool (...)."""
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


def _cond_sub_p(spec: FieldSpec, a):
    """If a >= p subtract p.  a < 2p assumed."""
    p = jnp.asarray(spec.p_limbs, dtype=DTYPE)
    p = jnp.broadcast_to(p, a.shape)
    diff, borrow = _sub_limbs(a, p)
    return jnp.where((borrow == 0)[..., None], diff, a)


def _skew_diag_sums(mat):
    """Anti-diagonal sums of (..., n, n) -> (..., 2n-1), exact in uint32.

    Row r padded to width 2n, flattened and re-chunked to width 2n-1 lands
    shifted right by r (index algebra: r*2n + c == r*(2n-1) + (r+c)), so a
    single reduction over rows yields sum_{i+j=k} mat[i, j].  Pure
    pad/reshape/reduce — integer-exact, compile-light, VPU-friendly.
    """
    n = mat.shape[-1]
    batch = mat.shape[:-2]
    padded = jnp.concatenate(
        [mat, jnp.zeros(batch + (n, n), dtype=mat.dtype)], axis=-1)
    flat = padded.reshape(*batch, 2 * n * n)[..., : n * (2 * n - 1)]
    skewed = flat.reshape(*batch, n, 2 * n - 1)
    return jnp.sum(skewed, axis=-2)


def _wide_mul_cols(a, b):
    """Full n-limb product as 2n columns of partial sums (each < 2^22).

    a, b: (..., n) -> (..., 2n) uint32 column sums (not carried).
    All-integer: the TPU's float matmul path truncates through bf16, so the
    anti-diagonal contraction uses the exact skew-reshape reduction instead.
    """
    n = a.shape[-1]
    prod = a[..., :, None] * b[..., None, :]  # (..., n, n) uint32 (exact)
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    cols_lo = _skew_diag_sums(lo)  # (..., 2n-1): col k = sum_{i+j=k}
    cols_hi = _skew_diag_sums(hi)
    cols = jnp.zeros(a.shape[:-1] + (2 * n,), dtype=DTYPE)
    cols = cols.at[..., : 2 * n - 1].add(cols_lo)
    cols = cols.at[..., 1: 2 * n].add(cols_hi)
    return cols


def _low_half_mul_limbs(a, b_const_limbs):
    """(a * b) mod R where b is a constant numpy limb vector.

    Used for q = T_low * p' mod R in REDC.  Returns carried n limbs.
    """
    n = a.shape[-1]
    b = jnp.asarray(b_const_limbs, dtype=DTYPE)
    prod = a[..., :, None] * b[None, :]  # (..., n, n)
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    cols_lo = _skew_diag_sums(lo)
    cols_hi = _skew_diag_sums(hi)
    cols = cols_lo[..., :n]
    cols = cols.at[..., 1:].add(cols_hi[..., : n - 1])
    out, _, _ = _carry_propagate(cols, n)
    return out


# ---------------------------------------------------------------------------
# Public field ops.  All take/return Montgomery-form (..., NLIMBS) uint32.
# ---------------------------------------------------------------------------


def _fjit(fn):
    """jit with the FieldSpec static (specs are identity-hashed singletons)."""
    return jax.jit(fn, static_argnums=0)


@_fjit
def add(spec: FieldSpec, a, b):
    s = a + b  # limb values < 2^17
    limbs, carry, _ = _carry_propagate(s, a.shape[-1])
    # a + b < 2p < R so carry out of the top limb is 0
    return _cond_sub_p(spec, limbs)


@_fjit
def sub(spec: FieldSpec, a, b):
    p = jnp.asarray(spec.p_limbs, dtype=DTYPE)
    diff, borrow = _sub_limbs(a, b)
    # if borrowed, add p back
    readd = diff + jnp.broadcast_to(p, diff.shape)
    readd, _, _ = _carry_propagate(readd, diff.shape[-1])
    return jnp.where((borrow == 1)[..., None], readd, diff)


@_fjit
def neg(spec: FieldSpec, a):
    p = jnp.asarray(spec.p_limbs, dtype=DTYPE)
    diff, _ = _sub_limbs(jnp.broadcast_to(p, a.shape), a)
    # p - 0 = p must wrap to 0
    is_zero = jnp.all(a == 0, axis=-1)
    return jnp.where(is_zero[..., None], jnp.zeros_like(a), diff)


def redc(spec: FieldSpec, cols):
    """Montgomery reduction of a 2n-limb value given as 2n column sums (< 2^27).

    Returns (T + q*p) / R  reduced to < p, in n limbs.
    """
    n = cols.shape[-1] // 2
    # Normalise low half to get exact T mod R.
    t_low, carry16, low_limbs = _carry_propagate(cols[..., :n], n)
    # q = T_low * p' mod R
    q = _low_half_mul_limbs(t_low, spec.pprime_limbs)
    # q * p (full product columns)
    p = jnp.asarray(spec.p_limbs, dtype=DTYPE)
    qp_cols = _wide_mul_cols(q, jnp.broadcast_to(p, q.shape))
    # total = T + q*p ; low half is ≡ 0 mod R; we need the carry into limb n.
    low_total = t_low + qp_cols[..., :n]
    _, carry_low, _ = _carry_propagate(low_total, n)
    hi = cols[..., n:] + qp_cols[..., n:]
    hi = hi.at[..., 0].add(carry_low + carry16)
    out, carry_out, _ = _carry_propagate(hi, n)
    # T + q*p < (p^2 + R*p); /R < 2p fits 16 limbs with carry_out==0 except
    # boundary; fold carry_out (0/1) into a conditional subtract loop: result
    # < 2p so one conditional subtract suffices and carry_out is always 0.
    return _cond_sub_p(spec, out)


@_fjit
def mul(spec: FieldSpec, a, b):
    """Montgomery product aR * bR -> abR (mod p)."""
    a, b = jnp.broadcast_arrays(a, b)
    cols = _wide_mul_cols(a, b)
    return redc(spec, cols)


@_fjit
def square(spec: FieldSpec, a):
    return mul(spec, a, a)


@_fjit
def from_mont(spec: FieldSpec, a):
    """Montgomery -> canonical residue limbs."""
    cols = jnp.concatenate(
        [a, jnp.zeros(a.shape, dtype=DTYPE)], axis=-1
    )
    return redc(spec, cols)


@_fjit
def to_mont(spec: FieldSpec, a):
    """Canonical residue limbs -> Montgomery form."""
    r2 = jnp.asarray(spec.r2_mont, dtype=DTYPE)
    return mul(spec, a, jnp.broadcast_to(r2, a.shape))


def pow_bits(spec: FieldSpec, a, bits):
    """a ** e where e is given by a static LE bit array (numpy).

    Uses a lax.scan over bit index with gathers from a precomputed bit vector,
    so the traced graph is O(1) in exponent length.
    """
    bits = jnp.asarray(np.asarray(bits, dtype=np.uint32))
    nbits = bits.shape[0]
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, dtype=DTYPE), a.shape)

    def body(carry, i):
        acc = carry
        # process MSB-first
        bit = bits[nbits - 1 - i]
        acc = square(spec, acc)
        mult = mul(spec, acc, a)
        acc = jnp.where(bit == 1, mult, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, one, jnp.arange(nbits))
    return acc


@_fjit
def inv(spec: FieldSpec, a):
    """Batched field inverse by Fermat (a^(p-2)); inv(0) = 0."""
    return pow_bits(spec, a, spec.inv_exp_bits)


@_fjit
def batch_inverse(spec: FieldSpec, a):
    """Montgomery's trick over the leading axis: n inversions for 1 inv + O(n) muls.

    a: (n, ..., NLIMBS).  Uses log-depth associative scans (TPU-friendly).
    inv of zeros handled by substituting 1 and masking back to 0.
    """
    n = a.shape[0]
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, dtype=DTYPE), a.shape)
    safe = jnp.where(is_zero, one, a)
    prefix = jax.lax.associative_scan(lambda x, y: mul(spec, x, y), safe, axis=0)
    total_inv = inv(spec, prefix[n - 1])
    rev = jnp.flip(safe, axis=0)
    suffix = jnp.flip(
        jax.lax.associative_scan(lambda x, y: mul(spec, x, y), rev, axis=0), axis=0
    )  # suffix[i] = prod_{j>=i} safe[j]
    ones_row = one[:1]
    prefix_excl = jnp.concatenate([ones_row, prefix[:-1]], axis=0)
    suffix_excl = jnp.concatenate([suffix[1:], ones_row], axis=0)
    out = mul(spec, mul(spec, prefix_excl, suffix_excl), total_inv[None])
    return jnp.where(is_zero, jnp.zeros_like(out), out)


@_fjit
def sqrt(spec: FieldSpec, a):
    """Batched Tonelli-Shanks square root (returns (root, has_root)).

    Only used at setup time (hash-to-curve generator sampling).
    """
    p = spec.modulus
    s = spec.two_adicity
    # w = a^((t-1)/2)
    w = pow_bits(spec, a, spec.t_bits)
    a_w = mul(spec, a, w)  # a^((t+1)/2)
    b = mul(spec, a_w, w)  # a^t
    z = jnp.broadcast_to(jnp.asarray(spec.root_of_unity_mont, DTYPE), a.shape)
    x = a_w
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, DTYPE), a.shape)

    def ord_step(b_i):
        # find least k with b^(2^k) == 1 by repeated squaring, bounded by s
        def body(c, _):
            val, k, done = c
            is_one = jnp.all(val == one, axis=-1)
            done2 = done | is_one
            val2 = jnp.where(done2[..., None], val, square(spec, val))
            k2 = jnp.where(done2, k, k + 1)
            return (val2, k2, done2), None

        (val, k, done), _ = jax.lax.scan(
            body,
            (b_i, jnp.zeros(b_i.shape[:-1], jnp.int32),
             jnp.zeros(b_i.shape[:-1], bool)),
            None,
            length=s + 1,
        )
        return k

    def loop_body(c, _):
        x, b, z, m = c
        k = ord_step(b)
        finished = k == 0
        # t = z^(2^(m-k-1))
        def sq_pow(val, n_sq):
            def body(v, i):
                v2 = jnp.where((i < n_sq)[..., None], square(spec, v), v)
                return v2, None
            out, _ = jax.lax.scan(
                body, val, jnp.arange(s))
            return out

        exp = m - k - 1
        t = sq_pow(z, exp)
        z_new = square(spec, t)
        b_new = mul(spec, b, z_new)
        x_new = mul(spec, x, t)
        x = jnp.where(finished[..., None], x, x_new)
        b = jnp.where(finished[..., None], b, b_new)
        z = jnp.where(finished[..., None], z, z_new)
        m = jnp.where(finished, m, k)
        return (x, b, z, m), None

    m0 = jnp.full(a.shape[:-1], s, jnp.int32)
    (x, b, z, m), _ = jax.lax.scan(loop_body, (x, b, z, m0), None, length=s)
    ok = jnp.all(mul(spec, x, x) == a, axis=-1) | jnp.all(a == 0, axis=-1)
    x = jnp.where(jnp.all(a == 0, axis=-1)[..., None], jnp.zeros_like(x), x)
    return x, ok


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------


def to_int(spec: FieldSpec, a) -> int:
    """Single Montgomery element -> python int (host sync)."""
    canon = np.asarray(from_mont(spec, a))
    return limbs_to_int(canon.reshape(spec.nlimbs))


def from_int(spec: FieldSpec, x: int):
    """python int -> Montgomery element on device."""
    limbs = jnp.asarray(int_to_limbs(x % spec.modulus, spec.nlimbs))
    return to_mont(spec, limbs)


def array_from_ints(spec: FieldSpec, xs) -> jnp.ndarray:
    """List of python ints -> (n, nlimbs) Montgomery array."""
    arr = (np.stack([int_to_limbs(x % spec.modulus, spec.nlimbs) for x in xs])
           if len(xs) else np.zeros((0, spec.nlimbs), np.uint32))
    return to_mont(spec, jnp.asarray(arr))


def array_to_ints(spec: FieldSpec, a) -> list:
    canon = np.asarray(from_mont(spec, a))
    flat = canon.reshape(-1, spec.nlimbs)
    return [limbs_to_int(row) for row in flat]


@functools.partial(jax.jit, static_argnums=(0, 2))
def canonical_bits(spec: FieldSpec, a, nbits: int = 256):
    """Montgomery array (..., nlimbs) -> (..., nbits) uint32 LE bit array."""
    canon = from_mont(spec, a)
    n = canon.shape[-1]
    shifts = jnp.arange(LIMB_BITS, dtype=DTYPE)
    bits = (canon[..., :, None] >> shifts[None, :]) & 1  # (..., n, 16)
    bits = bits.reshape(*canon.shape[:-1], n * LIMB_BITS)
    if nbits > n * LIMB_BITS:
        bits = jnp.concatenate(
            [bits, jnp.zeros(canon.shape[:-1] + (nbits - n * LIMB_BITS,),
                             DTYPE)], axis=-1)
    return bits[..., :nbits]


@_fjit
def reduce_raw_limbs(spec: FieldSpec, raw):
    """R uniform random bits -> field element (Montgomery form).

    raw < R < (k+1) p with k = R // p, so k conditional subtracts
    canonicalise it; for ~254-bit p over 2^256 the bias is O(2^-252) —
    negligible.  (For wider-gap fields like BLS12-381's 381-bit p over
    2^384 the residue bias is ~2^-3-level on low residues; acceptable for
    the setup/test sampling this is used for.)  A uniform residue is
    uniform in the Montgomery domain, so the result is used directly as a
    Montgomery-form element."""
    x = raw
    for _ in range((1 << (LIMB_BITS * spec.nlimbs)) // spec.modulus):
        x = _cond_sub_p(spec, x)
    return x


def random_elements(spec: FieldSpec, rng: np.random.Generator, shape=()):
    """Host RNG -> uniform field elements (Montgomery form, device array).

    Vectorised: one numpy draw + a jitted reduction (no per-element python)."""
    raw = rng.integers(0, 1 << LIMB_BITS, size=shape + (spec.nlimbs,),
                       dtype=np.uint32)
    return reduce_raw_limbs(spec, jnp.asarray(raw))
