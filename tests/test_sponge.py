"""Poseidon permutation + sponge tests, incl. golden transcript vectors.

The golden values pin this framework's documented Fiat-Shamir spec
(ops/sponge.py): any change to the permutation parameters or the
absorb/squeeze encoding rules is a breaking transcript change and must be
deliberate.
"""

import jax.numpy as jnp
import numpy as np

from accumulation_tpu.fields import fp
from accumulation_tpu.fields.pasta import FQ
from accumulation_tpu.ops import poseidon, sponge


def test_host_device_permutation_agree():
    state = [12345, 2**200 + 7, FQ.modulus - 3]
    host = poseidon.permute_host(FQ, state)
    dev = poseidon.permute_device(
        FQ, fp.to_mont(FQ, jnp.asarray(
            np.stack([fp.int_to_limbs(x) for x in state]))))
    assert fp.array_to_ints(FQ, dev) == host


def test_batched_device_permutation():
    batch = np.random.default_rng(0).integers(0, 2**63, size=(5, 3))
    host = [poseidon.permute_host(FQ, [int(x) for x in row]) for row in batch]
    dev = poseidon.permute_device(FQ, fp.to_mont(FQ, jnp.asarray(
        np.stack([[fp.int_to_limbs(int(x)) for x in row] for row in batch]))))
    assert [fp.array_to_ints(FQ, dev[i]) for i in range(5)] == host


def test_sponge_determinism_and_fork():
    def build():
        s = sponge.PoseidonSponge(FQ)
        s.absorb_u64(11)
        s.absorb_point((5, 7))
        s.absorb_scalar(123456789)
        return s

    c1 = build().squeeze_nonnative_truncated(128, 2)
    c2 = build().squeeze_nonnative_truncated(128, 2)
    assert c1 == c2
    assert all(0 <= x < 2**128 for x in c1)
    s = build()
    assert s.fork(b"A").squeeze_bits(64) != s.fork(b"B").squeeze_bits(64)
    # absorbing after squeezing re-permutes
    s2 = build()
    s2.squeeze_bits(10)
    s2.absorb_fq(42)
    assert s2.squeeze_bits(64) != build().squeeze_bits(64)


def test_golden_transcript():
    """Golden vector for the v1 transcript spec (recorded 2026-08-17)."""
    s = sponge.PoseidonSponge(FQ)
    s.absorb_u64(11)
    s.absorb_point((5, 7))
    s.absorb_scalar(123456789)
    c = s.squeeze_nonnative_truncated(128, 2)
    assert c[0] == 0xEB1EF5CDCC2915CD6089D35164C8D3A5
    assert c[1] == 0xA34E6758812F35A190A206B15AF92746


def test_domain_sponges_differ():
    a = sponge.domain_sponge(FQ, sponge.IPA_PC_DOMAIN).squeeze_bits(64)
    b = sponge.domain_sponge(FQ, sponge.AS_FOR_IPA_PC_DOMAIN).squeeze_bits(64)
    assert a != b


def test_absorb_byte_packing():
    # 31-byte chunking: 32 bytes -> two elements
    s1 = sponge.PoseidonSponge(FQ)
    s1.absorb_bytes(bytes(range(32)))
    s2 = sponge.PoseidonSponge(FQ)
    s2.absorb_elements([
        int.from_bytes(bytes(range(31)), "little"), 31])
    assert s1.squeeze_bits(64) == s2.squeeze_bits(64)
