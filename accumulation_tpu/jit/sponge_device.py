"""Device-resident Poseidon sponge for fully-jitted proving pipelines.

Implements the identical duplex/encoding spec as the host sponge
(ops/sponge.py) over limb tensors, so a fused prover can run its whole
Fiat-Shamir transcript on-chip (SURVEY.md §7.4: "absorb/squeeze as jax ops so
Fiat-Shamir never leaves HBM").  The duplex *schedule* (who absorbs when) is
python-static per traced shape; the *values* are traced arrays.  Equivalence
with the host sponge is covered by tests/test_jit_pipeline.py.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE, FieldSpec
from ..ops import poseidon


class DeviceSponge:
    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.state = jnp.zeros((poseidon.T, spec.nlimbs), DTYPE)
        self.mode = "absorb"
        self.pos = 0

    def _permute(self):
        self.state = poseidon.permute_device(self.spec, self.state)

    def absorb_elements(self, elems: List[jnp.ndarray]):
        """elems: list of (NLIMBS,) Montgomery Fq arrays."""
        if self.mode == "squeeze":
            self._permute()
            self.mode = "absorb"
            self.pos = 0
        for e in elems:
            if self.pos == poseidon.RATE:
                self._permute()
                self.pos = 0
            idx = poseidon.CAPACITY + self.pos
            self.state = self.state.at[idx].set(
                fp.add(self.spec, self.state[idx], e))
            self.pos += 1

    def absorb_u64(self, x: int):
        self.absorb_elements([fp.from_int(self.spec, int(x))])

    def absorb_nonnative(self, scalar_spec: FieldSpec, x):
        """Nonnative (scalar-field) element: identical encoding to the host
        sponge's absorb_scalar — 32 canonical LE bytes split into 31-byte
        chunks, each absorbed as one Fq element (ops/sponge.py spec).

        x: (nlimbs,) Montgomery Fr tensor.  Requires the 16x16-bit limb
        layout (chunk boundary at bit 248 = limb 15 bit 8)."""
        assert scalar_spec.nlimbs == 16 and self.spec.nlimbs == 16
        canon = fp.from_mont(scalar_spec, x)  # (16,) canonical LE limbs
        lo = canon.at[15].set(canon[15] & 0xFF)       # bits 0..247
        hi = jnp.zeros((16,), DTYPE).at[0].set(canon[15] >> 8)  # bits 248+
        self.absorb_elements([
            fp.to_mont(self.spec, lo), fp.to_mont(self.spec, hi)])

    def absorb_point(self, pt):
        """pt: Affine with scalar shape; encodes [x, y, inf ? 1 : 0]."""
        one = jnp.asarray(self.spec.one_mont, DTYPE)
        zero = jnp.zeros((self.spec.nlimbs,), DTYPE)
        inf = pt.inf[..., None]
        self.absorb_elements([
            jnp.where(inf, zero, pt.x),
            jnp.where(inf, zero, pt.y),
            jnp.where(inf, one, zero),
        ])

    def squeeze_elements(self, n: int) -> List[jnp.ndarray]:
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

    def squeeze_fr_truncated(self, scalar_spec: FieldSpec,
                             size_bits: int = 128) -> jnp.ndarray:
        """One truncated nonnative challenge as a Montgomery Fr element.

        Spec: low `size_bits` bits (LE) of ceil(size/128) squeezed elements.
        """
        k = (size_bits + 127) // 128
        elems = self.squeeze_elements(k)
        limbs = jnp.zeros((scalar_spec.nlimbs,), DTYPE)
        for ci, e in enumerate(elems):
            canon = fp.from_mont(self.spec, e)
            take_bits = min(128, size_bits - 128 * ci)
            take_limbs = (take_bits + fp.LIMB_BITS - 1) // fp.LIMB_BITS
            seg = canon[:take_limbs]
            if take_bits % fp.LIMB_BITS:
                mask = (1 << (take_bits % fp.LIMB_BITS)) - 1
                seg = seg.at[take_limbs - 1].set(seg[take_limbs - 1] & mask)
            base = 128 * ci // fp.LIMB_BITS
            limbs = limbs.at[base:base + take_limbs].set(seg)
        return fp.to_mont(scalar_spec, limbs)
