"""Field-arithmetic unit tests vs python-int ground truth."""

import numpy as np
import pytest

from accumulation_tpu.fields import fp
from accumulation_tpu.fields.pasta import FQ, FR


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    p = FQ.modulus
    xs = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(32)]
    ys = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(32)]
    return xs, ys, fp.array_from_ints(FQ, xs), fp.array_from_ints(FQ, ys)


def test_add_sub_mul_neg(data):
    xs, ys, a, b = data
    p = FQ.modulus
    assert fp.array_to_ints(FQ, fp.add(FQ, a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert fp.array_to_ints(FQ, fp.sub(FQ, a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert fp.array_to_ints(FQ, fp.mul(FQ, a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert fp.array_to_ints(FQ, fp.neg(FQ, a)) == [(-x) % p for x in xs]


def test_edge_values():
    p = FQ.modulus
    edge = [0, 1, p - 1, p - 2, 2**255 % p, (p + 1) // 2]
    a = fp.array_from_ints(FQ, edge)
    assert fp.array_to_ints(FQ, fp.mul(FQ, a, a)) == [x * x % p for x in edge]
    assert fp.array_to_ints(FQ, fp.add(FQ, a, a)) == [2 * x % p for x in edge]
    assert fp.array_to_ints(FQ, fp.neg(FQ, a)) == [(-x) % p for x in edge]


def test_inverse(data):
    xs, _, a, _ = data
    p = FQ.modulus
    assert fp.array_to_ints(FQ, fp.inv(FQ, a)) == [pow(x, -1, p) for x in xs]


def test_batch_inverse_with_zero(data):
    xs, _, a, _ = data
    p = FQ.modulus
    a0 = a.at[3].set(0)
    got = fp.array_to_ints(FQ, fp.batch_inverse(FQ, a0))
    assert got == [pow(x, -1, p) if i != 3 else 0 for i, x in enumerate(xs)]


def test_sqrt(data):
    xs, _, a, _ = data
    p = FQ.modulus
    sq = fp.mul(FQ, a, a)
    root, ok = fp.sqrt(FQ, sq)
    assert bool(np.asarray(ok).all())
    for g, x in zip(fp.array_to_ints(FQ, root), xs):
        assert g in (x, p - x)


def test_canonical_bits(data):
    xs, _, a, _ = data
    bits = np.asarray(fp.canonical_bits(FQ, a[0]))
    assert sum(int(bits[i]) << i for i in range(256)) == xs[0]


def test_fr_field():
    rng = np.random.default_rng(1)
    r = FR.modulus
    xs = [int.from_bytes(rng.bytes(40), "little") % r for _ in range(8)]
    a = fp.array_from_ints(FR, xs)
    assert fp.array_to_ints(FR, fp.mul(FR, a, a)) == [x * x % r for x in xs]


def test_random_elements_distribution(rng):
    a = fp.random_elements(FQ, rng, (64,))
    vals = fp.array_to_ints(FQ, a)
    assert len(set(vals)) == 64
    assert all(0 <= v < FQ.modulus for v in vals)
