"""Poseidon permutation over a prime field — parameters + host/device impls.

TPU-native replacement for the `ark-sponge` PoseidonSponge layer the reference
uses for every Fiat-Shamir transcript (reference src/hp_as/mod.rs:752-780,
src/ipa_pc_as/mod.rs:15, and tests instantiating `PoseidonSponge<Fq>`, e.g.
src/hp_as/mod.rs:1050).

Parameter spec (documented so transcripts are reproducible):
  * width t = 3 (rate 2, capacity 1), S-box x^5, R_F = 8 full rounds,
    R_P = 56 partial rounds (partial S-box applied to state[0]).
  * Round constants: ``blake2b(f"{field.name}|poseidon-rc|{round}|{lane}")``,
    64-byte digest interpreted little-endian, reduced mod p.
  * MDS: Cauchy matrix ``m[i][j] = 1 / (x_i + y_j)`` with x = (0,1,2),
    y = (3,4,5) over the field.

The Rust reference depends on ark-sponge's (unpublished, branch-pinned)
constants, which are not reproducible in this environment; this framework
pins its own deterministic parameters instead and carries its own golden
transcript vectors (tests/test_sponge.py).

Two implementations share these constants:
  * a host implementation on python ints (used by the host-orchestrated
    scheme drivers — the permutation is a few hundred 255-bit modmuls, which
    python does in ~100us, far below device dispatch latency for a width-1 op);
  * a device implementation on limb tensors (`permute_device`), used inside
    fully-jitted pipelines where the transcript must stay on-chip.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FieldSpec

T = 3
RATE = 2
CAPACITY = 1
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 56
ALPHA = 5


@functools.lru_cache(maxsize=None)
def poseidon_params(spec: FieldSpec):
    """Returns (ark, mds) as python-int tuples: ark[round][i], mds[i][j]."""
    p = spec.modulus
    n_rounds = FULL_ROUNDS + PARTIAL_ROUNDS
    ark = []
    for r in range(n_rounds):
        row = []
        for i in range(T):
            h = hashlib.blake2b(
                f"{spec.name}|poseidon-rc|{r}|{i}".encode(), digest_size=64
            ).digest()
            row.append(int.from_bytes(h, "little") % p)
        ark.append(tuple(row))
    xs = (0, 1, 2)
    ys = (3, 4, 5)
    mds = tuple(
        tuple(pow(x + y, -1, p) for y in ys) for x in xs
    )
    return tuple(ark), mds


def permute_host(spec: FieldSpec, state):
    """Host permutation: state = [int; 3] -> [int; 3]."""
    p = spec.modulus
    ark, mds = poseidon_params(spec)
    s = list(state)
    half = FULL_ROUNDS // 2
    n_rounds = FULL_ROUNDS + PARTIAL_ROUNDS

    def sbox(x):
        x2 = x * x % p
        x4 = x2 * x2 % p
        return x4 * x % p

    for r in range(n_rounds):
        s = [(s[i] + ark[r][i]) % p for i in range(T)]
        if half <= r < half + PARTIAL_ROUNDS:
            s[0] = sbox(s[0])
        else:
            s = [sbox(x) for x in s]
        s = [
            sum(mds[i][j] * s[j] for j in range(T)) % p
            for i in range(T)
        ]
    return s


@functools.lru_cache(maxsize=None)
def _device_constants(spec: FieldSpec):
    ark, mds = poseidon_params(spec)
    r = spec.r_mod_p
    p = spec.modulus
    nl = spec.nlimbs
    ark_mont = np.stack(
        [np.stack([fp.int_to_limbs(c * r % p, nl) for c in row]) for row in ark]
    )  # (rounds, T, nlimbs)
    mds_mont = np.stack(
        [np.stack([fp.int_to_limbs(c * r % p, nl) for c in row]) for row in mds]
    )  # (T, T, nlimbs)
    # numpy, NOT jnp: this cache is shared across jit traces, and a jnp
    # constant materialised inside a trace is a tracer — memoising it would
    # leak the tracer into later traces (UnexpectedTracerError)
    return ark_mont, mds_mont


def permute_device(spec: FieldSpec, state):
    """Device permutation on Montgomery limb tensors.

    state: (..., T, NLIMBS) uint32 -> same.  Batched over leading dims; used
    by the fused jitted pipelines (transcript never leaves HBM).
    """
    ark_np, mds_np = _device_constants(spec)
    ark, mds = jnp.asarray(ark_np), jnp.asarray(mds_np)
    half = FULL_ROUNDS // 2
    n_rounds = FULL_ROUNDS + PARTIAL_ROUNDS

    def sbox(x):
        x2 = fp.square(spec, x)
        x4 = fp.square(spec, x2)
        return fp.mul(spec, x4, x)

    def mds_apply(s):
        # s: (..., T, NLIMBS); out[i] = sum_j mds[i][j] * s[j]
        prods = fp.mul(spec, mds[:, :, :], s[..., None, :, :])  # (..., T, T, L)
        acc = prods[..., 0, :]
        for j in range(1, T):
            acc = fp.add(spec, acc, prods[..., j, :])
        return acc

    def full_round(s, rc):
        s = fp.add(spec, s, rc)
        s = sbox(s)
        return mds_apply(s)

    def partial_round(s, rc):
        s = fp.add(spec, s, rc)
        s0 = sbox(s[..., 0:1, :])
        s = jnp.concatenate([s0, s[..., 1:, :]], axis=-2)
        return mds_apply(s)

    s = state
    for r in range(half):
        s = full_round(s, ark[r])

    def scan_body(s, rc):
        return partial_round(s, rc), None

    s, _ = jax.lax.scan(scan_body, s, ark[half:half + PARTIAL_ROUNDS])
    for r in range(half + PARTIAL_ROUNDS, n_rounds):
        s = full_round(s, ark[r])
    return s
