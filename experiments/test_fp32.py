"""f32 limb-engine correctness vs python ints and the uint32 engine."""

import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from accumulation_tpu.fields import fp
import fp32
from accumulation_tpu.fields.pasta import FQ

ES = fp32.make_f32(FQ)
P = FQ.modulus


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    xs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
    ys = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
    return xs, ys


def _to_engine(xs):
    import jax.numpy as jnp
    # x -> x * R' mod p directly (host), as f32 limbs
    Rp = 1 << (fp32.LIMB_BITS * fp32.NLIMBS)
    return jnp.asarray(np.stack(
        [fp32.int_to_limbs9(x * Rp % P) for x in xs]))


def _from_engine(a):
    Rp = 1 << (fp32.LIMB_BITS * fp32.NLIMBS)
    rinv = pow(Rp, -1, P)
    return [fp32.limbs9_to_int(np.asarray(a[i])) * rinv % P
            for i in range(a.shape[0])]


def test_mul_add_sub_neg(data):
    xs, ys = data
    a = _to_engine(xs)
    b = _to_engine(ys)
    assert _from_engine(fp32.mul(ES, a, b)) == [x * y % P for x, y in zip(xs, ys)]
    assert _from_engine(fp32.add(ES, a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert _from_engine(fp32.sub(ES, a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert _from_engine(fp32.neg(ES, a)) == [(-x) % P for x in xs]
    assert _from_engine(fp32.square(ES, a)) == [x * x % P for x in xs]


def test_edge_values():
    edge = [0, 1, P - 1, 2**255 % P]
    a = _to_engine(edge)
    assert _from_engine(fp32.mul(ES, a, a)) == [x * x % P for x in edge]


def test_engine_conversions(data):
    xs, _ = data
    u32 = fp.array_from_ints(FQ, xs)       # uint32 Montgomery (R=2^256)
    f = fp32.from_uint32(ES, u32)
    assert _from_engine(f) == xs
    back = fp32.to_uint32(ES, f)
    assert fp.array_to_ints(FQ, back) == xs


def test_mul_chain(data):
    xs, ys = data
    a = _to_engine(xs)
    b = _to_engine(ys)
    c = a
    for _ in range(5):
        c = fp32.mul(ES, c, b)
    want = [x * pow(y, 5, P) % P for x, y in zip(xs, ys)]
    assert _from_engine(c) == want
