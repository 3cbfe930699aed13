"""Dense univariate polynomial ops over a scalar field (layer L1, poly part).

TPU-native counterpart of the `ark-poly` DensePolynomial surface the
reference consumes (`evaluate`, `naive_mul`, linear division, `+=`; e.g.
reference src/trivial_pc_as/mod.rs:198-202, src/ipa_pc_as/mod.rs:391-421).

A polynomial is a fixed-length coefficient tensor ``(..., D, NLIMBS)`` in
Montgomery form, low degree first, zero-padded to its allocation — static
shapes are what XLA wants, and degree bookkeeping lives at the scheme layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE, FieldSpec


def _pjit(fn):
    return jax.jit(fn, static_argnums=0)


@_pjit
def evaluate(spec: FieldSpec, coeffs, point):
    """Evaluation.  coeffs (..., D, L), point (..., L) -> (..., L).

    Horner (sequential scan) for small D; for large D the scan's D
    sequential steps dominate wall-clock (2^20 steps at the flagship
    degree), so it switches to <coeffs, powers(point)> — two log-depth
    associative scans."""
    d = coeffs.shape[-2]
    moved = jnp.moveaxis(coeffs, -2, 0)  # (D, ..., L)
    out_shape = jnp.broadcast_shapes(point.shape, moved.shape[1:])

    if d > 128:
        pows = powers(spec, point, d)  # (D,) + point.shape
        # align the D axis with moved's leading axis for broadcasting
        pows = pows.reshape(
            (d,) + (1,) * (moved.ndim - pows.ndim) + pows.shape[1:])
        prods = fp.mul(spec, moved, pows)
        # log-depth pairwise tree sum over the D axis
        n = d
        while n > 1:
            half = n // 2
            s = fp.add(spec, prods[:half], prods[half:2 * half])
            prods = jnp.concatenate([s, prods[2 * half:n]], axis=0) \
                if n % 2 else s
            n = half + (n % 2)
        return jnp.broadcast_to(prods[0], out_shape)

    def body(acc, c):
        return fp.add(spec, fp.mul(spec, acc, point), c), None

    init = jnp.zeros(out_shape, DTYPE)
    acc, _ = jax.lax.scan(body, init, moved[::-1])
    return acc


@_pjit
def divide_by_linear(spec: FieldSpec, coeffs, z):
    """Synthetic division by (X - z).

    coeffs: (D, L) -> (quotient (D, L) with top coefficient zero, remainder).
    p(X) = (X - z) q(X) + r with q_i = a_{i+1} + z*q_{i+1}.
    """
    d = coeffs.shape[-2]

    def body(q_next, a):
        q_i = fp.add(spec, a, fp.mul(spec, z, q_next))
        return q_i, q_next

    # scan from the top coefficient down; emitted values are q_{i} shifted
    rem, qs = jax.lax.scan(body, jnp.zeros_like(z), coeffs[::-1])
    q = qs[::-1]  # q[i] = quotient coefficient i
    return q, rem


@_pjit
def weighted_sum(spec: FieldSpec, vecs, weights):
    """sum_i weights[i] * vecs[i] over the leading axis.

    vecs: (m, ..., L), weights: (m, L) (or (m, ..., L) broadcastable).
    Log-depth tree of field adds.
    """
    m = vecs.shape[0]
    w = weights.reshape(
        weights.shape[:1] + (1,) * (vecs.ndim - 2) + (weights.shape[-1],))
    terms = fp.mul(spec, vecs, w)
    while m > 1:
        half = m // 2
        low, high = terms[:half], terms[half:half * 2]
        summed = fp.add(spec, low, high)
        if m % 2:
            summed = jnp.concatenate([summed, terms[-1:]], axis=0)
            m = half + 1
        else:
            m = half
        terms = summed
    return terms[0]


@_pjit
def scale(spec: FieldSpec, coeffs, c):
    return fp.mul(spec, coeffs, c[..., None, :])


@functools.partial(jax.jit, static_argnums=(0, 2))
def powers(spec: FieldSpec, x, n: int):
    """[1, x, x^2, ..., x^{n-1}] -> (n, L).  Log-depth doubling ladder:
    p_{2k} = p_k ++ (p_k * x^k).  Same depth as an associative scan but
    half the multiply work and a gather-free graph — the scan's recursive
    odd/even interleaving at n = 2^20 produced a graph the XLA:TPU
    pipeline chewed on for tens of minutes (round-3 prewarm)."""
    if n <= 0:
        return jnp.zeros((0, spec.nlimbs), DTYPE)
    one = jnp.asarray(spec.one_mont, DTYPE)
    p = one[None]           # powers [x^0 .. x^{len-1}]
    xk = x                  # x^(len) for the current len
    length = 1
    while length < n:
        step = min(length, n - length)
        p = jnp.concatenate([p, fp.mul(spec, p[:step], xk[None])], axis=0)
        if 2 * length < n:
            xk = fp.mul(spec, xk, xk)
        length += step
    return p


def from_ints(spec: FieldSpec, ints, pad_to=None):
    n = len(ints)
    d = pad_to or n
    arr = np.zeros((d, spec.nlimbs), np.uint32)
    for i, x in enumerate(ints):
        arr[i] = fp.int_to_limbs(x % spec.modulus, spec.nlimbs)
    return fp.to_mont(spec, jnp.asarray(arr))


def to_ints(spec: FieldSpec, coeffs):
    return fp.array_to_ints(spec, coeffs)
