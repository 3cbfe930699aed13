"""Duplex sponge + Absorbable encoding spec (layer L2, transcript).

Mirrors the `ark-sponge` surface the reference consumes
(`CryptographicSponge::{absorb, squeeze_bits,
squeeze_nonnative_field_elements_with_sizes, fork}`, `DomainSeparatedSponge`,
`Absorbable`; reference call sites: src/hp_as/mod.rs:752-780,
src/ipa_pc_as/mod.rs:254-299, src/r1cs_nark_as/mod.rs:112-125).

Encoding spec (this framework's documented Fiat-Shamir rules):
  * native field element (Fq)       -> absorbed directly (1 sponge element)
  * byte string                     -> split into 31-byte little-endian
                                       chunks, each < 2^248 < p, absorbed as
                                       field elements (final partial chunk
                                       zero-padded implicitly by the int)
  * u64                             -> 8 LE bytes, via the byte rule
  * nonnative scalar (Fr)           -> 32 LE bytes of canonical value
  * curve point (affine)            -> [x, y, inf ? 1 : 0] as 3 Fq elements
  * list                            -> concatenation (no length prefix)
  * squeeze_bits(n)                 -> low 128 bits (LE) of each of
                                       ceil(n/128) squeezed elements
  * truncated nonnative challenge k -> squeeze_bits(k) as LE integer
  * fork(domain)                    -> state copy, then absorb domain bytes
  * domain_sponge(domain)           -> fresh sponge, then absorb domain bytes

The sponge here runs on the host over python ints (exact, ~100us/permutation)
and is used by the host-orchestrated scheme drivers; the fused on-device
pipelines (accumulation_tpu.jit) implement the identical spec with
poseidon.permute_device (cross-checked in tests/test_sponge.py).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

from ..fields.fp import FieldSpec
from . import poseidon

SQUEEZE_BITS_PER_ELEMENT = 128


class PoseidonSponge:
    """Duplex Poseidon sponge over `spec` (the constraint field Fq)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.state: List[int] = [0] * poseidon.T
        self.mode = "absorb"  # 'absorb' | 'squeeze'
        self.pos = 0

    # -- core duplex --------------------------------------------------------

    def clone(self) -> "PoseidonSponge":
        s = PoseidonSponge(self.spec)
        s.state = list(self.state)
        s.mode = self.mode
        s.pos = self.pos
        return s

    def _permute(self):
        self.state = poseidon.permute_host(self.spec, self.state)

    def absorb_elements(self, elems: Sequence[int]):
        if self.mode == "squeeze":
            self._permute()
            self.mode = "absorb"
            self.pos = 0
        p = self.spec.modulus
        for e in elems:
            if self.pos == poseidon.RATE:
                self._permute()
                self.pos = 0
            idx = poseidon.CAPACITY + self.pos
            self.state[idx] = (self.state[idx] + e) % p
            self.pos += 1

    def squeeze_elements(self, n: int) -> List[int]:
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

    # -- absorb spec --------------------------------------------------------

    def absorb_bytes(self, data: bytes):
        elems = []
        for i in range(0, max(len(data), 1), 31):
            chunk = data[i:i + 31]
            elems.append(int.from_bytes(chunk, "little"))
        if len(data) == 0:
            elems = [0]
        self.absorb_elements(elems)

    def absorb_u64(self, x: int):
        self.absorb_bytes(int(x).to_bytes(8, "little"))

    def absorb_fq(self, x: int):
        self.absorb_elements([x % self.spec.modulus])

    def absorb_fqs(self, xs: Iterable[int]):
        p = self.spec.modulus
        self.absorb_elements([x % p for x in xs])

    def absorb_scalar(self, x: int):
        """Nonnative (scalar-field) element: 32 canonical LE bytes."""
        self.absorb_bytes(int(x).to_bytes(32, "little"))

    def absorb_scalars(self, xs: Iterable[int]):
        for x in xs:
            self.absorb_scalar(x)

    def absorb_point(self, pt):
        """pt: (x, y) python ints or None for infinity."""
        if pt is None:
            self.absorb_elements([0, 0, 1])
        else:
            self.absorb_elements([pt[0] % self.spec.modulus,
                                  pt[1] % self.spec.modulus, 0])

    def absorb_points(self, pts: Iterable):
        for pt in pts:
            self.absorb_point(pt)

    # -- squeeze spec -------------------------------------------------------

    def squeeze_bits(self, n: int) -> List[int]:
        k = (n + SQUEEZE_BITS_PER_ELEMENT - 1) // SQUEEZE_BITS_PER_ELEMENT
        elems = self.squeeze_elements(k)
        bits = []
        for e in elems:
            for i in range(SQUEEZE_BITS_PER_ELEMENT):
                bits.append((e >> i) & 1)
        return bits[:n]

    def squeeze_field_elements(self, n: int) -> List[int]:
        """Native (Fq) squeeze."""
        return self.squeeze_elements(n)

    def squeeze_nonnative_truncated(self, size_bits: int, count: int = 1) -> List[int]:
        """Truncated nonnative challenges (reference `FieldElementSize::Truncated`).

        Each challenge consumes its own squeezed elements; size_bits <= 254 so
        the LE integer is already canonical in the scalar field.
        """
        out = []
        for _ in range(count):
            bits = self.squeeze_bits(size_bits)
            out.append(sum(b << i for i, b in enumerate(bits)))
        return out

    # -- domain separation --------------------------------------------------

    def fork(self, domain: bytes) -> "PoseidonSponge":
        s = self.clone()
        s.absorb_bytes(domain)
        return s


def domain_sponge(spec: FieldSpec, domain: bytes) -> PoseidonSponge:
    """`DomainSeparatedSponge::new()` analog: fresh sponge + domain bytes."""
    s = PoseidonSponge(spec)
    s.absorb_bytes(domain)
    return s


# Domain separator strings (identical to the reference's):
IPA_PC_DOMAIN = b"IPA-PC-2020"                # reference src/ipa_pc_as/data_structures.rs:89-95
AS_FOR_IPA_PC_DOMAIN = b"AS-FOR-IPA-PC-2020"  # reference src/ipa_pc_as/data_structures.rs:97-103
R1CS_NARK_DOMAIN = b"R1CS-NARK-2020"          # reference src/r1cs_nark_as/r1cs_nark/mod.rs:27
AS_FOR_R1CS_NARK_DOMAIN = b"AS-FOR-R1CS-NARK-2020"  # reference src/r1cs_nark_as/mod.rs:38
AS_FOR_HP_DOMAIN = b"AS-FOR-HP-2020"          # reference src/r1cs_nark_as/mod.rs:37
