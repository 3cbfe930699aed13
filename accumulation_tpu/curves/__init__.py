from . import weierstrass
from .weierstrass import Affine, Projective, CurveSpec, make_curve
from ..fields.pasta import FQ, FR

# The Pallas curve of the Pasta cycle: y^2 = x^3 + 5 over FQ, generator (-1, 2)
# (the instantiation used throughout the reference tests/examples, e.g.
# /root/reference/src/hp_as/mod.rs:1047-1050).
PALLAS = make_curve("pallas", FQ, FR, 5, -1, 2)

# Vesta — the cycle partner (base/scalar fields swapped, same b and
# generator).  Every scheme is generic over CurveSpec; for PCD recursion the
# next circuit layer runs over the partner curve.
VESTA = make_curve("vesta", FR, FQ, 5, -1, 2)

# BLS12-381 G1: y^2 = x^3 + 4 over the 381-bit base field (24 limbs) — the
# beyond-Pasta instantiation proving the field layer generalises (standard
# generator from the BLS12-381 spec / ark-bls12-381).
from ..fields.bls12_381 import FQ381, FR381

_BLS_GX = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
_BLS_GY = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1
# G1 cofactor h = (x-1)^2 / 3 for the BLS parameter x = -0xd201000000010000;
# |E(Fq)| = h * r, so hash-to-curve sampling multiplies by h (see
# pedersen._sample_points cofactor clearing).
_BLS_H1 = 0x396C8C005555E1568C00AAAB0000AAAB
BLS12_381_G1 = make_curve("bls12_381_g1", FQ381, FR381, 4, _BLS_GX, _BLS_GY,
                          cofactor=_BLS_H1)
