"""Emulated (non-native) scalar-field arithmetic in-circuit.

TPU-native counterpart of `ark-nonnative-field` as consumed by the reference
gadgets (NonNativeFieldVar / mul_without_reduce; e.g. reference
src/trivial_pc_as/constraints/mod.rs:62-88): scalar-field (Fr) values inside
a constraint system over the base field Fq.

Representation: 3 limbs of 86 bits, value = sum limb_i 2^{86 i}; every
allocated limb is range-checked by bit decomposition.  The workhorse is
`enforce_relation`: for mul terms (s, a, b) and linear terms (s, x) with
signs s, it enforces

    sum s * a*b + sum s * x + const == 0  (mod r)

over the integers, by allocating the quotient q and carry witnesses and
checking the padded limb identity

    sum_k (LHS_k - (q*r)_k + pad_k) 2^{86 k} == 0

with a carry chain whose per-position magnitudes stay far below the native
modulus p (so the Fq equalities imply integer equalities given the range
checks).  pad is a constant multiple of r that makes every intermediate
non-negative.  This is the standard grouped-limb technique (same family as
arkworks' group_and_check_equality).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from . import r1cs
from .gadgets import BoolVar, FpVar, GadgetCS, bit_decompose

LIMB_BITS = 86
NUM_LIMBS = 3


def _split(value: int) -> List[int]:
    mask = (1 << LIMB_BITS) - 1
    return [(value >> (LIMB_BITS * i)) & mask for i in range(NUM_LIMBS)]


@dataclass
class EmulatedVar:
    """A non-native Fr element as range-checked Fq limb vars."""

    limbs: List[FpVar]
    bound_bits: List[int]  # per-limb magnitude bound (bits)
    value: int             # canonical witness value mod r

    @staticmethod
    def alloc(g: GadgetCS, r: int, value: int, public: bool = False
              ) -> "EmulatedVar":
        value %= r
        limbs = []
        alloc = FpVar.public_input if public else FpVar.witness
        for lv in _split(value):
            var = alloc(g, lv)
            # range check: 86-bit decomposition
            bits = []
            acc = FpVar.constant(g, 0)
            for i in range(LIMB_BITS):
                b = BoolVar.witness(g, (lv >> i) & 1)
                acc = acc + b.var.scale(1 << i)
            acc.enforce_equal(var)
            limbs.append(var)
        return EmulatedVar(limbs, [LIMB_BITS] * NUM_LIMBS, value)

    @staticmethod
    def constant(g: GadgetCS, value: int) -> "EmulatedVar":
        return EmulatedVar(
            [FpVar.constant(g, lv) for lv in _split(value)],
            [LIMB_BITS] * NUM_LIMBS, value)

    @staticmethod
    def from_bits(g: GadgetCS, r: int, bits: List[BoolVar]) -> "EmulatedVar":
        """Pack already-boolean-constrained LE bits (e.g. a squeezed
        challenge) — linear, no new constraints."""
        limbs = []
        for li in range(NUM_LIMBS):
            acc = FpVar.constant(g, 0)
            for i in range(LIMB_BITS):
                bit_idx = li * LIMB_BITS + i
                if bit_idx < len(bits):
                    acc = acc + bits[bit_idx].var.scale(1 << i)
            limbs.append(acc)
        value = sum(b.value << i for i, b in enumerate(bits)) % r
        bb = [min(LIMB_BITS, max(0, len(bits) - li * LIMB_BITS))
              for li in range(NUM_LIMBS)]
        return EmulatedVar(limbs, bb, value)


def enforce_relation(g: GadgetCS, r: int,
                     mul_terms: List[Tuple[int, EmulatedVar, EmulatedVar]],
                     lin_terms: List[Tuple[int, EmulatedVar]] = (),
                     const: int = 0):
    """Enforce sum s*a*b + sum s*x + const == 0 (mod r); signs s in {+1,-1}."""
    p = g.p
    n_prod_limbs = 2 * NUM_LIMBS - 1

    # symbolic product limbs (FpVars) + integer magnitude bounds
    lhs = [FpVar.constant(g, 0) for _ in range(n_prod_limbs)]
    neg_bound = [0] * n_prod_limbs  # max magnitude of negative contributions
    pos_bound = [0] * n_prod_limbs

    for s, a, b in mul_terms:
        for i in range(NUM_LIMBS):
            for j in range(NUM_LIMBS):
                prod = a.limbs[i] * b.limbs[j]
                term_bound = 1 << (a.bound_bits[i] + b.bound_bits[j])
                if s > 0:
                    lhs[i + j] = lhs[i + j] + prod
                    pos_bound[i + j] += term_bound
                else:
                    lhs[i + j] = lhs[i + j] - prod
                    neg_bound[i + j] += term_bound
    for s, x in lin_terms:
        for i in range(NUM_LIMBS):
            if s > 0:
                lhs[i] = lhs[i] + x.limbs[i]
                pos_bound[i] += 1 << x.bound_bits[i]
            else:
                lhs[i] = lhs[i] - x.limbs[i]
                neg_bound[i] += 1 << x.bound_bits[i]
    const %= r
    for i, lv in enumerate(_split(const)):
        lhs[i] = lhs[i].add_constant(lv)
        pos_bound[i] += lv

    # integer value of the LHS (for quotient computation)
    total = 0
    for s, a, b in mul_terms:
        total += s * a.value * b.value
    for s, x in lin_terms:
        total += s * x.value
    total += const
    assert total % r == 0, "relation does not hold on the witness"

    # pad: constant multiple of r making every limb column non-negative and
    # the total non-negative.  pad_k >= neg_bound[k] limb-wise.
    total_neg = sum(neg_bound[k] << (LIMB_BITS * k) for k in range(n_prod_limbs))
    pad_mult = (total_neg // r) + 1
    pad = pad_mult * r
    pad_limbs = [
        (pad >> (LIMB_BITS * k)) & ((1 << LIMB_BITS) - 1)
        for k in range(n_prod_limbs + 2)
    ]
    # distribute so that column k gets at least neg_bound[k]: simplest sound
    # choice — give every column its pad share from the padded constant and
    # let the carries absorb the rest.  We fold pad into the RHS as q' * r
    # with q' = q + pad_mult, tracking the integer identity
    #   LHS + pad = (q + pad_mult) * r
    q_int = (total + pad) // r
    assert q_int >= 0

    # allocate q limbs (range-checked).  Bound on q:
    q_bits = max(q_int.bit_length(), 1)
    n_q_limbs = (q_bits + LIMB_BITS - 1) // LIMB_BITS
    n_q_limbs = max(n_q_limbs, 1)
    q_limbs = []
    for li in range(n_q_limbs):
        lv = (q_int >> (LIMB_BITS * li)) & ((1 << LIMB_BITS) - 1)
        var = FpVar.witness(g, lv)
        acc = FpVar.constant(g, 0)
        for i in range(LIMB_BITS):
            bb = BoolVar.witness(g, (lv >> i) & 1)
            acc = acc + bb.var.scale(1 << i)
        acc.enforce_equal(var)
        q_limbs.append(var)

    # rhs limbs: (q * r)_k  — linear in q (r limbs are constants)
    r_limbs = _split(r)
    n_total = n_q_limbs + NUM_LIMBS - 1
    n_cols = max(n_prod_limbs, n_total) + 1
    rhs = [FpVar.constant(g, 0) for _ in range(n_cols)]
    for i in range(n_q_limbs):
        for j in range(NUM_LIMBS):
            rhs[i + j] = rhs[i + j] + q_limbs[i].scale(r_limbs[j])

    # full columns: D_k = LHS_k + pad_k_const - RHS_k ; carry chain
    lhs_full = list(lhs) + [FpVar.constant(g, 0)] * (n_cols - n_prod_limbs)
    pos_full = list(pos_bound) + [0] * (n_cols - n_prod_limbs)
    neg_full = list(neg_bound) + [0] * (n_cols - n_prod_limbs)
    for k in range(n_cols):
        if k < len(pad_limbs):
            lhs_full[k] = lhs_full[k].add_constant(pad_limbs[k])
            pos_full[k] += pad_limbs[k]

    # carries: value-computed on host ints, allocated with shifted range check
    carry_prev = None
    carry_prev_int = 0
    carry_prev_bound = 0
    # integer column values
    col_int = []
    for k in range(n_cols):
        v = 0
        for s, a, b in mul_terms:
            av, bv = _split(a.value), _split(b.value)
            for i in range(NUM_LIMBS):
                for j in range(NUM_LIMBS):
                    if i + j == k:
                        v += s * av[i] * bv[j]
        for s, x in lin_terms:
            if k < NUM_LIMBS:
                v += s * _split(x.value)[k]
        if k < NUM_LIMBS:
            v += _split(const)[k]
        if k < len(pad_limbs):
            v += pad_limbs[k]
        qv = [(q_int >> (LIMB_BITS * li)) & ((1 << LIMB_BITS) - 1)
              for li in range(n_q_limbs)]
        for i in range(n_q_limbs):
            for j in range(NUM_LIMBS):
                if i + j == k:
                    v -= qv[i] * r_limbs[j]
        col_int.append(v)

    # NOTE on emulated-limb values: EmulatedVar limb values must track the
    # actual (possibly non-canonical) limb assignment; alloc/from_bits use
    # canonical splits so _split(value) matches the assigned limbs.

    for k in range(n_cols):
        d = lhs_full[k] - rhs[k]
        d_int = col_int[k] + carry_prev_int
        if carry_prev is not None:
            d = d + carry_prev
        # bound for |d|: lhs magnitudes + rhs (q*r) column + previous carry
        rhs_bound = min(n_q_limbs, NUM_LIMBS) << (2 * LIMB_BITS)
        mag = pos_full[k] + neg_full[k] + rhs_bound \
            + (carry_prev_bound if carry_prev is not None else 0)
        if k == n_cols - 1:
            # last column must be exactly zero
            assert d_int == 0, "carry chain mismatch"
            d.enforce_zero()
            break
        carry_int = d_int >> LIMB_BITS
        assert d_int & ((1 << LIMB_BITS) - 1) == 0 or True
        # d = carry * 2^86  (exact division requirement)
        assert d_int % (1 << LIMB_BITS) == 0, "column not divisible"
        # allocate carry with shifted range check (carry may be negative)
        shift_bits = max(mag.bit_length() - LIMB_BITS + 2, 1)
        shift = 1 << shift_bits
        e_int = carry_int + shift
        assert e_int >= 0, "carry shift too small"
        e_var = FpVar.witness(g, e_int)
        acc = FpVar.constant(g, 0)
        for i in range(shift_bits + 2):
            bb = BoolVar.witness(g, (e_int >> i) & 1)
            acc = acc + bb.var.scale(1 << i)
        acc.enforce_equal(e_var)
        carry = e_var.add_constant(-shift % g.p)
        # enforce d == carry * 2^86
        (d - carry.scale(1 << LIMB_BITS)).enforce_zero()
        carry_prev = carry
        carry_prev_int = carry_int
        carry_prev_bound = 1 << (shift_bits + 2)


def enforce_mul_equal(g: GadgetCS, r: int, a: EmulatedVar, b: EmulatedVar,
                      c: EmulatedVar):
    """a * b == c (mod r)."""
    enforce_relation(g, r, [(1, a, b)], [(-1, c)])


def enforce_equal(g: GadgetCS, r: int, a: EmulatedVar, b: EmulatedVar):
    """a == b (mod r) (limb values may be non-canonical representations)."""
    one = EmulatedVar.constant(g, 1)
    enforce_relation(g, r, [(1, a, one)], [(-1, b)])
