"""Constraint gadget substrate (layer L0/L6 support).

TPU-native counterpart of the `ark-r1cs-std` surface the reference's verifier
gadgets consume (`FpVar`, `Boolean`, `CurveVar::scalar_mul_le`, sponge
gadgets; reference src/constraints.rs and */constraints/).  The purpose of
this layer (as in the reference) is PCD recursion: the accumulation verifier
is re-expressed as an R1CS over the constraint field so it can be embedded in
a circuit; the witness generator runs host-side over python ints while the
constraint matrices come from constraints.r1cs.ConstraintSystem.

Design choices:
  * `FpVar` is a symbolic linear combination (additions and scalings are
    free, as in arkworks); a multiplication allocates one witness row;
  * curve points use homogeneous projective coordinates with the same
    complete RCB15 formulas as the native kernels — a single branch-free
    constraint pattern, no case analysis in-circuit;
  * squeezed challenges are full bit decompositions of sponge outputs
    (booleanity-constrained); scalar multiplications consume challenge bits
    via double-and-add with per-bit selects (`scalar_mul_le`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..fields.fp import FieldSpec
from ..ops import poseidon
from . import r1cs


class GadgetCS:
    """Wraps a ConstraintSystem with value tracking for synthesis.

    Pass `cs` to synthesise into an existing system (e.g. to prove a
    verifier gadget with the NARK — the PCD recursion composition)."""

    def __init__(self, spec: FieldSpec, cs: r1cs.ConstraintSystem = None):
        self.cs = cs if cs is not None else r1cs.ConstraintSystem(spec, r1cs.PROVE)
        self.spec = spec
        self.p = spec.modulus

    # raw variables ---------------------------------------------------------

    def new_witness(self, value: int) -> int:
        return self.cs.new_witness_variable(value % self.p)

    def new_input(self, value: int) -> int:
        return self.cs.new_input_variable(value % self.p)

    def finalize(self):
        self.cs.finalize()
        return self.cs

    @property
    def num_constraints(self):
        return self.cs.num_constraints


@dataclass
class FpVar:
    """Symbolic linear combination over the constraint field + its value."""

    g: GadgetCS
    terms: List[Tuple[int, int]]  # (coeff, var)
    value: int

    # constructors ----------------------------------------------------------

    @staticmethod
    def constant(g: GadgetCS, value: int) -> "FpVar":
        value %= g.p
        return FpVar(g, [(value, 0)] if value else [], value)

    @staticmethod
    def witness(g: GadgetCS, value: int) -> "FpVar":
        v = g.new_witness(value)
        return FpVar(g, [(1, v)], value % g.p)

    @staticmethod
    def public_input(g: GadgetCS, value: int) -> "FpVar":
        v = g.new_input(value)
        return FpVar(g, [(1, v)], value % g.p)

    # linear ops (free) -----------------------------------------------------

    def __add__(self, other: "FpVar") -> "FpVar":
        return FpVar(self.g, self.terms + other.terms,
                     (self.value + other.value) % self.g.p)

    def __sub__(self, other: "FpVar") -> "FpVar":
        neg = [((-c) % self.g.p, v) for c, v in other.terms]
        return FpVar(self.g, self.terms + neg,
                     (self.value - other.value) % self.g.p)

    def scale(self, k: int) -> "FpVar":
        k %= self.g.p
        return FpVar(self.g, [(c * k % self.g.p, v) for c, v in self.terms],
                     self.value * k % self.g.p)

    def add_constant(self, k: int) -> "FpVar":
        return self + FpVar.constant(self.g, k)

    # multiplicative ops (1 constraint each) --------------------------------

    def __mul__(self, other: "FpVar") -> "FpVar":
        g = self.g
        out_val = self.value * other.value % g.p
        out = FpVar.witness(g, out_val)
        g.cs.enforce_constraint(
            r1cs.LinearCombination(list(self.terms)),
            r1cs.LinearCombination(list(other.terms)),
            r1cs.LinearCombination(list(out.terms)))
        return out

    def square(self) -> "FpVar":
        return self * self

    def reduced(self, threshold: int = 24) -> "FpVar":
        """Collapse a long linear combination into a fresh witness (one
        constraint).  Without this, linear-only round functions (Poseidon
        partial rounds) grow LCs exponentially — same role as arkworks'
        LC inlining."""
        if len(self.terms) <= threshold:
            return self
        g = self.g
        out = FpVar.witness(g, self.value)
        g.cs.enforce_constraint(
            r1cs.LinearCombination(list(self.terms)),
            r1cs.LinearCombination([(1, 0)]),
            r1cs.LinearCombination(list(out.terms)))
        return out

    def enforce_equal(self, other: "FpVar"):
        g = self.g
        diff = self - other
        g.cs.enforce_constraint(
            r1cs.LinearCombination(list(diff.terms)),
            r1cs.LinearCombination([(1, 0)]),
            r1cs.LinearCombination([]))

    def enforce_zero(self):
        self.enforce_equal(FpVar.constant(self.g, 0))


@dataclass
class BoolVar:
    """A booleanity-constrained FpVar."""

    var: FpVar

    @staticmethod
    def witness(g: GadgetCS, value: int) -> "BoolVar":
        v = FpVar.witness(g, 1 if value else 0)
        # b * (1 - b) = 0
        one_minus = FpVar.constant(g, 1) - v
        g.cs.enforce_constraint(
            r1cs.LinearCombination(list(v.terms)),
            r1cs.LinearCombination(list(one_minus.terms)),
            r1cs.LinearCombination([]))
        return BoolVar(v)

    @property
    def value(self) -> int:
        return self.var.value

    def select(self, if_true: FpVar, if_false: FpVar) -> FpVar:
        """b ? x : y  =  b*(x - y) + y   (1 constraint)."""
        return self.var * (if_true - if_false) + if_false


def enforce_bits_lt_constant(g: GadgetCS, bits: List[BoolVar], bound: int):
    """Enforce that the LE bit vector encodes an integer strictly < bound.

    MSB-down equality chain: `eq` stays 1 while the processed (more
    significant) prefix equals bound's prefix.  Where bound's bit is 1,
    eq' = eq * b (a 0 bit makes the value strictly smaller — eq drops to 0
    permanently); where bound's bit is 0, enforce eq * b == 0 (a 1 bit under
    an equal prefix would make the value larger).  Finally eq == 0 rejects
    exact equality.  ~1 constraint per bit.  Mirrors the canonicity that the
    reference gets for free from `squeeze_bits`
    (/root/reference/src/hp_as/constraints/mod.rs:70-128)."""
    eq = FpVar.constant(g, 1)
    for i in reversed(range(len(bits))):
        b = bits[i].var
        if (bound >> i) & 1:
            eq = eq * b
        else:
            g.cs.enforce_constraint(
                r1cs.LinearCombination(list(eq.terms)),
                r1cs.LinearCombination(list(b.terms)),
                r1cs.LinearCombination([]))
    eq.enforce_zero()


def bit_decompose(g: GadgetCS, x: FpVar, nbits: int = 255,
                  canonical: bool = True) -> List[BoolVar]:
    """Allocate nbits booleans with sum(b_i 2^i) == x, and (by default) the
    canonical range check sum(b_i 2^i) < p — without it the (x + p)
    decomposition would let a malicious prover choose between two challenge
    values per squeeze.  ~2*nbits constraints."""
    bits = []
    val = x.value
    for i in range(nbits):
        bits.append(BoolVar.witness(g, (val >> i) & 1))
    acc = FpVar.constant(g, 0)
    for i, b in enumerate(bits):
        acc = acc + b.var.scale(pow(2, i, g.p))
    acc.enforce_equal(x)
    if canonical:
        enforce_bits_lt_constant(g, bits, g.p)
    return bits


# ---------------------------------------------------------------------------
# Poseidon sponge gadget (mirrors ops/sponge.py over FpVars)
# ---------------------------------------------------------------------------


class SpongeGadget:
    """In-circuit duplex Poseidon; replays the native transcript exactly."""

    def __init__(self, g: GadgetCS):
        self.g = g
        self.state = [FpVar.constant(g, 0) for _ in range(poseidon.T)]
        self.mode = "absorb"
        self.pos = 0
        self.ark, self.mds = poseidon.poseidon_params(g.spec)

    def _sbox(self, x: FpVar) -> FpVar:
        x2 = x.square()
        x4 = x2.square()
        return x4 * x

    def _permute(self):
        half = poseidon.FULL_ROUNDS // 2
        n_rounds = poseidon.FULL_ROUNDS + poseidon.PARTIAL_ROUNDS
        s = self.state
        for r in range(n_rounds):
            s = [s[i].add_constant(self.ark[r][i]) for i in range(poseidon.T)]
            if half <= r < half + poseidon.PARTIAL_ROUNDS:
                s = [self._sbox(s[0])] + s[1:]
            else:
                s = [self._sbox(x) for x in s]
            s = [
                sum((s[j].scale(self.mds[i][j]) for j in range(1, poseidon.T)),
                    s[0].scale(self.mds[i][0])).reduced()
                for i in range(poseidon.T)
            ]
        self.state = s

    def absorb(self, elems: List[FpVar]):
        if self.mode == "squeeze":
            self._permute()
            self.mode = "absorb"
            self.pos = 0
        for e in elems:
            if self.pos == poseidon.RATE:
                self._permute()
                self.pos = 0
            idx = poseidon.CAPACITY + self.pos
            self.state[idx] = self.state[idx] + e
            self.pos += 1

    def absorb_constant_bytes(self, data: bytes):
        elems = []
        for i in range(0, max(len(data), 1), 31):
            elems.append(FpVar.constant(
                self.g, int.from_bytes(data[i:i + 31], "little")))
        if len(data) == 0:
            elems = [FpVar.constant(self.g, 0)]
        self.absorb(elems)

    def absorb_u64(self, x: int):
        self.absorb_constant_bytes(int(x).to_bytes(8, "little"))

    def squeeze(self, n: int) -> List[FpVar]:
        if self.mode == "absorb":
            self._permute()
            self.mode = "squeeze"
            self.pos = 0
        out = []
        for _ in range(n):
            if self.pos == poseidon.RATE:
                self._permute()
                self.pos = 0
            out.append(self.state[poseidon.CAPACITY + self.pos])
            self.pos += 1
        return out

    def squeeze_challenge_bits(self, size_bits: int) -> List[BoolVar]:
        """One truncated challenge as its LE bit vector (native spec:
        low 128 bits of each squeezed element, one element per 128 bits)."""
        k = (size_bits + 127) // 128
        bits: List[BoolVar] = []
        for elem in self.squeeze(k):
            all_bits = bit_decompose(self.g, elem, 255)
            bits.extend(all_bits[:128])
        return bits[:size_bits]


# ---------------------------------------------------------------------------
# Projective point gadget (complete RCB15 formulas, a = 0)
# ---------------------------------------------------------------------------


@dataclass
class PointVar:
    x: FpVar
    y: FpVar
    z: FpVar

    @staticmethod
    def alloc(g: GadgetCS, pt, public: bool = False) -> "PointVar":
        """pt: (x, y) python ints or None (infinity) -> projective var."""
        alloc = FpVar.public_input if public else FpVar.witness
        if pt is None:
            return PointVar(alloc(g, 0), alloc(g, 1), alloc(g, 0))
        return PointVar(alloc(g, pt[0]), alloc(g, pt[1]), alloc(g, 1))

    @staticmethod
    def identity(g: GadgetCS) -> "PointVar":
        return PointVar(FpVar.constant(g, 0), FpVar.constant(g, 1),
                        FpVar.constant(g, 0))

    def affine_coords(self, g: GadgetCS):
        """Host-side value as (x, y) or None (for debugging/tests)."""
        p = g.p
        if self.z.value == 0:
            return None
        zinv = pow(self.z.value, -1, p)
        return (self.x.value * zinv % p, self.y.value * zinv % p)


def enforce_point_canonical(g: GadgetCS, pt: PointVar, curve_b: int):
    """Canonical-representative + on-curve enforcement for an allocated point.

    z in {0,1};  z=0 implies the point is exactly (0:1:0);  z=1 implies the
    affine on-curve relation y^2 = x^3 + b.  Without this, the witness point
    (0:0:0) is absorbing under the RCB15 add/double formulas and vacuously
    passes `point_enforce_equal` against anything — allocating it for every
    instance/proof point would break soundness of all four verifier gadgets.
    RCB15 completeness guarantees that sums of canonical on-curve points
    never *produce* (0:0:0), so enforcing at allocation suffices.
    7 constraints."""
    one = FpVar.constant(g, 1)
    one_minus_z = one - pt.z
    # z * (1 - z) == 0
    g.cs.enforce_constraint(
        r1cs.LinearCombination(list(pt.z.terms)),
        r1cs.LinearCombination(list(one_minus_z.terms)),
        r1cs.LinearCombination([]))
    # (1 - z) * x == 0
    g.cs.enforce_constraint(
        r1cs.LinearCombination(list(one_minus_z.terms)),
        r1cs.LinearCombination(list(pt.x.terms)),
        r1cs.LinearCombination([]))
    # (1 - z) * (y - 1) == 0
    y_minus_1 = pt.y - one
    g.cs.enforce_constraint(
        r1cs.LinearCombination(list(one_minus_z.terms)),
        r1cs.LinearCombination(list(y_minus_1.terms)),
        r1cs.LinearCombination([]))
    # y^2 * z == x^3 + b*z   (z boolean, so z^3 == z)
    y2 = pt.y * pt.y
    x2 = pt.x * pt.x
    x3 = x2 * pt.x
    rhs = x3 + pt.z.scale(curve_b)
    g.cs.enforce_constraint(
        r1cs.LinearCombination(list(y2.terms)),
        r1cs.LinearCombination(list(pt.z.terms)),
        r1cs.LinearCombination(list(rhs.terms)))


def point_add(g: GadgetCS, p: PointVar, q: PointVar, b3: int) -> PointVar:
    """Complete addition (RCB15 alg 7) — 12 mul constraints + linear b3 scales."""
    X1, Y1, Z1 = p.x, p.y, p.z
    X2, Y2, Z2 = q.x, q.y, q.z
    t0 = X1 * X2
    t1 = Y1 * Y2
    t2 = Z1 * Z2
    t3 = (X1 + Y1) * (X2 + Y2) - (t0 + t1)
    t4 = (Y1 + Z1) * (Y2 + Z2) - (t1 + t2)
    y3 = (X1 + Z1) * (X2 + Z2) - (t0 + t2)
    t0_3 = t0 + t0 + t0
    t2b = t2.scale(b3)
    z3 = t1 + t2b
    t1m = t1 - t2b
    y3b = y3.scale(b3)
    X3 = t3 * t1m - t4 * y3b
    Y3 = y3b * t0_3 + t1m * z3
    Z3 = z3 * t4 + t0_3 * t3
    return PointVar(X3, Y3, Z3)


def point_double(g: GadgetCS, p: PointVar, b3: int) -> PointVar:
    """Complete doubling (RCB15 alg 9)."""
    X, Y, Z = p.x, p.y, p.z
    t0 = Y * Y
    z3 = t0 + t0
    z3 = z3 + z3
    z3 = z3 + z3
    t1 = Y * Z
    t2 = (Z * Z).scale(b3)
    X3 = t2 * z3
    Y3 = t0 + t2
    Z3 = t1 * z3
    t1b = t2 + t2
    t2c = t1b + t2
    t0m = t0 - t2c
    Y3 = t0m * Y3 + X3
    t1c = X * Y
    X3 = t0m * t1c
    X3 = X3 + X3
    return PointVar(X3, Y3, Z3)


def point_select(g: GadgetCS, b: BoolVar, if_true: PointVar,
                 if_false: PointVar) -> PointVar:
    return PointVar(
        b.select(if_true.x, if_false.x),
        b.select(if_true.y, if_false.y),
        b.select(if_true.z, if_false.z))


def scalar_mul_le(g: GadgetCS, pt: PointVar, bits: List[BoolVar],
                  b3: int) -> PointVar:
    """Double-and-add over LE challenge bits (mirrors `scalar_mul_le`,
    reference src/hp_as/constraints/mod.rs:135-160)."""
    acc = PointVar.identity(g)
    for bit in reversed(bits):
        acc = point_double(g, acc, b3)
        added = point_add(g, acc, pt, b3)
        acc = point_select(g, bit, added, acc)
    return acc


def point_enforce_equal(g: GadgetCS, p: PointVar, q: PointVar):
    """Projective equality by cross-multiplication (sound incl. identity)."""
    (p.x * q.z).enforce_equal(q.x * p.z)
    (p.y * q.z).enforce_equal(q.y * p.z)
