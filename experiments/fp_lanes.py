"""Lane-major field arithmetic: limb axis leading, batch in VPU lanes.

The default layout (..., NLIMBS) maps the 16 limbs onto the TPU's 128-wide
lane dimension — 12.5% lane utilisation, measured as the dominant
inefficiency of the limb kernels.  This engine stores elements transposed,
shape (NLIMBS, ...batch...), so the batch fills the lanes and every
elementwise op runs at full vector width.  Same 16x16-bit Montgomery
representation and algorithms as fields/fp.py; used by the throughput
kernels (ops/msm.py lane path); conversion is a transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from accumulation_tpu.fields.fp import (FieldSpec, LIMB_BITS, LIMB_MASK, NLIMBS, DTYPE)


def to_lanes(a):
    """(..., NLIMBS) -> (NLIMBS, ...)."""
    return jnp.moveaxis(a, -1, 0)


def from_lanes(a):
    """(NLIMBS, ...) -> (..., NLIMBS)."""
    return jnp.moveaxis(a, 0, -1)


def _carry(cols):
    """cols: (n, ...) -> (n, ...) 16-bit limbs + carry (...)."""
    n = cols.shape[0]
    limbs = []
    carry = jnp.zeros(cols.shape[1:], DTYPE)
    for i in range(n):
        v = cols[i] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(limbs, axis=0), carry


def _sub_borrow(a, b):
    limbs = []
    borrow = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), DTYPE)
    for i in range(a.shape[0]):
        v = a[i] - b[i] - borrow
        limbs.append(v & LIMB_MASK)
        borrow = (v >> 31) & 1
    return jnp.stack(limbs, axis=0), borrow


def _const(spec_limbs, ref):
    """numpy (n,) constant -> (n, ...) broadcastable array."""
    c = jnp.asarray(spec_limbs, dtype=DTYPE)
    return c.reshape((c.shape[0],) + (1,) * (ref.ndim - 1))


def _cond_sub_p(spec: FieldSpec, a):
    p = jnp.broadcast_to(_const(spec.p_limbs, a), a.shape)
    diff, borrow = _sub_borrow(a, p)
    return jnp.where((borrow == 0)[None], diff, a)


def add(spec: FieldSpec, a, b):
    s, _ = _carry(a + b)
    return _cond_sub_p(spec, s)


def sub(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    diff, borrow = _sub_borrow(a, b)
    p = jnp.broadcast_to(_const(spec.p_limbs, diff), diff.shape)
    readd, _ = _carry(diff + p)
    return jnp.where((borrow == 1)[None], readd, diff)


def _wide_cols(a, b):
    """Full product column sums: (2*NLIMBS, ...), each < 2^22.

    Shifted accumulation over the limb axis (leading): 16 iterations of
    lane-wide multiply + two slice-adds.
    """
    n = a.shape[0]
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    cols = jnp.zeros((2 * n,) + shape, DTYPE)
    for i in range(n):
        prod = a[i][None] * b  # (n, ...) exact uint32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        cols = cols.at[i:i + n].add(lo)
        cols = cols.at[i + 1:i + n + 1].add(hi)
    return cols


def mul(spec: FieldSpec, a, b):
    n = a.shape[0]
    cols = _wide_cols(a, b)
    t_low, carry16 = _carry(cols[:n])
    ppr = _const(spec.pprime_limbs, t_low)
    # q = T_low * p' mod R (low half only)
    qshape = t_low.shape[1:]
    qcols = jnp.zeros((n + 1,) + qshape, DTYPE)
    for i in range(n):
        ncol = n - i
        prod = t_low[i][None] * ppr
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        qcols = qcols.at[i:i + ncol].add(lo[:ncol])
        qcols = qcols.at[i + 1:i + ncol + 1].add(hi[:ncol])
    q, _ = _carry(qcols[:n])
    qp = _wide_cols(q, jnp.broadcast_to(_const(spec.p_limbs, q), q.shape))
    low_total = t_low + qp[:n]
    _, carry_low = _carry(low_total)
    hi = cols[n:] + qp[n:]
    hi = hi.at[0].add(carry_low + carry16)
    out, _ = _carry(hi)
    return _cond_sub_p(spec, out)


def square(spec: FieldSpec, a):
    return mul(spec, a, a)


def neg(spec: FieldSpec, a):
    p = jnp.broadcast_to(_const(spec.p_limbs, a), a.shape)
    diff, _ = _sub_borrow(p, a)
    is_zero = jnp.all(a == 0, axis=0)
    return jnp.where(is_zero[None], jnp.zeros_like(a), diff)


def is_zero(a):
    return jnp.all(a == 0, axis=0)
