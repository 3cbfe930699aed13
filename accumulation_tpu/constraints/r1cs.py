"""R1CS constraint-system substrate (layer L0).

TPU-native counterpart of the `ark-relations` surface the reference consumes
(`ConstraintSystem::{new_ref, set_mode, finalize, to_matrices, num_*}`,
sparse `Matrix<F>`; reference src/r1cs_nark_as/r1cs_nark/mod.rs:84-100,
138-154, 443-462).

A constraint system collects rows (A_i, B_i, C_i) of linear combinations over
variables [one, instance..., witness...] such that <A_i, z> * <B_i, z> =
<C_i, z>.  Matrices live host-side as python structures during synthesis and
compile to a padded ELL device layout for the hot mat-vec path (gather +
field-mul + log-tree row reduction — regular shapes for XLA, no per-row
control flow).
"""

from __future__ import annotations

import functools
import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE, FieldSpec

SETUP = "setup"
PROVE = "prove"


@dataclass
class LinearCombination:
    """Sparse sum of (coeff, variable) terms; variables are global indices."""

    terms: List[Tuple[int, int]] = field(default_factory=list)

    def __add__(self, other):
        return LinearCombination(self.terms + other.terms)


@dataclass
class SparseMatrix:
    """Rows of (coeff_int, var_index) terms over a field."""

    spec: FieldSpec
    rows: List[List[Tuple[int, int]]] = field(default_factory=list)

    def num_nonzero(self) -> int:
        return sum(len(r) for r in self.rows)

    def to_ell(self, num_vars: int):
        """Padded ELL device layout: (idx (R, K) int32, coeffs (R, K, L))."""
        r = len(self.rows)
        k = max((len(row) for row in self.rows), default=0)
        k = max(k, 1)
        idx = np.full((r, k), num_vars, dtype=np.int32)  # sentinel -> zero
        coeff = np.zeros((r, k, self.spec.nlimbs), dtype=np.uint32)
        mont = self.spec.r_mod_p
        p = self.spec.modulus
        for i, row in enumerate(self.rows):
            for j, (c, v) in enumerate(row):
                idx[i, j] = v
                coeff[i, j] = fp.int_to_limbs((c % p) * mont % p, self.spec.nlimbs)
        return jnp.asarray(idx), jnp.asarray(coeff)

    def serialize(self) -> bytes:
        """Canonical bytes for matrix hashing (this framework's codec)."""
        out = [len(self.rows).to_bytes(8, "little")]
        for row in self.rows:
            out.append(len(row).to_bytes(8, "little"))
            for c, v in row:
                out.append((c % self.spec.modulus).to_bytes(32, "little"))
                out.append(v.to_bytes(8, "little"))
        return b"".join(out)


def hash_matrices(domain: bytes, a: SparseMatrix, b: SparseMatrix,
                  c: SparseMatrix) -> bytes:
    """Blake2b-256 matrix hash (reference r1cs_nark/mod.rs:422-440)."""
    h = hashlib.blake2b(digest_size=32)
    h.update(domain)
    h.update(a.serialize())
    h.update(b.serialize())
    h.update(c.serialize())
    return h.digest()


@functools.partial(jax.jit, static_argnums=0)
def _ell_matvec(spec: FieldSpec, idx, coeff, z_padded):
    """(R, K) idx + (R, K, L) coeffs x (V+1, L) padded vector -> (R, L)."""
    gathered = z_padded[idx]          # (R, K, L)
    prods = fp.mul(spec, coeff, gathered)
    k = prods.shape[1]
    while k > 1:
        half = k // 2
        s = fp.add(spec, prods[:, :half], prods[:, half:half * 2])
        if k % 2:
            s = jnp.concatenate([s, prods[:, -1:]], axis=1)
            k = half + 1
        else:
            k = half
        prods = s
    return prods[:, 0]


def matrix_vec_mul(spec: FieldSpec, ell, input_arr, witness_arr):
    """M * (input || witness); reference r1cs_nark/mod.rs:443-462.

    ell: (idx, coeff) from to_ell(); input/witness: (k, L) Montgomery arrays.
    """
    idx, coeff = ell
    z = jnp.concatenate(
        [input_arr, witness_arr,
         jnp.zeros((1, input_arr.shape[-1]), DTYPE)], axis=0)
    return _ell_matvec(spec, idx, coeff, z)


class ConstraintSystem:
    """Minimal R1CS builder (new_ref/set_mode/finalize/to_matrices analog)."""

    def __init__(self, spec: FieldSpec, mode: str = SETUP):
        self.spec = spec
        self.mode = mode
        self.instance_assignment: List[int] = [1]  # variable 0 = ONE
        self.witness_assignment: List[int] = []
        self.num_instance_variables = 1
        self.num_witness_variables = 0
        self.a = SparseMatrix(spec)
        self.b = SparseMatrix(spec)
        self.c = SparseMatrix(spec)
        self.num_constraints = 0

    # variables ------------------------------------------------------------

    def one(self) -> int:
        return 0

    def new_input_variable(self, value: Optional[int] = None) -> int:
        idx = self.num_instance_variables
        self.num_instance_variables += 1
        if self.mode == PROVE:
            assert value is not None
            self.instance_assignment.append(value % self.spec.modulus)
        return idx

    def new_witness_variable(self, value: Optional[int] = None) -> int:
        idx = self.num_witness_variables
        self.num_witness_variables += 1
        if self.mode == PROVE:
            assert value is not None
            self.witness_assignment.append(value % self.spec.modulus)
        # witness variables are indexed after all instance variables at
        # finalize time; store a tagged index
        return -(idx + 1)

    def lc(self, *terms) -> LinearCombination:
        """terms: (coeff, var) pairs."""
        return LinearCombination([(c, v) for c, v in terms])

    def enforce_constraint(self, a: LinearCombination, b: LinearCombination,
                           c: LinearCombination):
        self.a.rows.append(list(a.terms))
        self.b.rows.append(list(b.terms))
        self.c.rows.append(list(c.terms))
        self.num_constraints += 1

    # finalize -------------------------------------------------------------

    def finalize(self):
        """Resolve witness variable tags to global indices."""
        n_inst = self.num_instance_variables

        def fix(mat: SparseMatrix):
            for row in mat.rows:
                for i, (coeff, v) in enumerate(row):
                    if v < 0:
                        row[i] = (coeff, n_inst + (-v - 1))

        for m in (self.a, self.b, self.c):
            fix(m)

    def to_matrices(self):
        return self.a, self.b, self.c

    @property
    def num_variables(self):
        return self.num_instance_variables + self.num_witness_variables

    def is_satisfied(self) -> bool:
        """Host-side satisfaction check (test utility)."""
        p = self.spec.modulus
        z = self.instance_assignment + self.witness_assignment

        def ev(row):
            return sum(c * z[v] for c, v in row) % p

        for ra, rb, rc in zip(self.a.rows, self.b.rows, self.c.rows):
            if ev(ra) * ev(rb) % p != ev(rc):
                return False
        return True
