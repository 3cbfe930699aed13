"""Polynomial-op unit tests vs python-int ground truth."""

import numpy as np

from accumulation_tpu.fields import fp
from accumulation_tpu.fields.pasta import FR
from accumulation_tpu.ops import poly as poly_ops

R = FR.modulus


def test_evaluate(rng):
    coeffs_int = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(9)]
    z = int.from_bytes(rng.bytes(40), "little") % R
    coeffs = poly_ops.from_ints(FR, coeffs_int)
    got = fp.to_int(FR, poly_ops.evaluate(FR, coeffs, fp.from_int(FR, z)))
    want = sum(c * pow(z, i, R) for i, c in enumerate(coeffs_int)) % R
    assert got == want


def test_divide_by_linear(rng):
    coeffs_int = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(8)]
    z = int.from_bytes(rng.bytes(40), "little") % R
    coeffs = poly_ops.from_ints(FR, coeffs_int)
    q, rem = poly_ops.divide_by_linear(FR, coeffs, fp.from_int(FR, z))
    q_int = poly_ops.to_ints(FR, q)
    rem_int = fp.to_int(FR, rem)
    # verify p(X) == (X - z) q(X) + rem by re-expansion
    recon = [0] * len(coeffs_int)
    for i, qc in enumerate(q_int[:-1]):
        recon[i + 1] = (recon[i + 1] + qc) % R
        recon[i] = (recon[i] - z * qc) % R
    recon[0] = (recon[0] + rem_int) % R
    assert recon == coeffs_int
    assert q_int[-1] == 0  # top coefficient of the quotient padding
    # remainder is p(z)
    assert rem_int == sum(c * pow(z, i, R) for i, c in enumerate(coeffs_int)) % R


def test_weighted_sum(rng):
    m, d = 5, 6
    vecs_int = [[int.from_bytes(rng.bytes(40), "little") % R for _ in range(d)]
                for _ in range(m)]
    ws_int = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(m)]
    import jax.numpy as jnp
    vecs = jnp.stack([poly_ops.from_ints(FR, v) for v in vecs_int])
    ws = fp.array_from_ints(FR, ws_int)
    got = poly_ops.to_ints(FR, poly_ops.weighted_sum(FR, vecs, ws))
    want = [sum(w * v[i] for w, v in zip(ws_int, vecs_int)) % R
            for i in range(d)]
    assert got == want


def test_powers(rng):
    x = int.from_bytes(rng.bytes(40), "little") % R
    got = poly_ops.to_ints(FR, poly_ops.powers(FR, fp.from_int(FR, x), 7))
    assert got == [pow(x, i, R) for i in range(7)]
