"""BLS12-381 G1 fields — the beyond-255-bit instantiation (SURVEY.md §7.1).

Demonstrates that the limb-tensor field layer generalises past the Pasta
moduli: the 381-bit base field runs on 24 x 16-bit limbs (Montgomery
R = 2^384), the 255-bit scalar field on the default 16 limbs.  Moduli from
the published BLS12-381 specification (as used by arkworks `ark-bls12-381`).

Naming follows the arkworks convention: Fq = base field of G1 (the
constraint/sponge field for schemes over this curve), Fr = scalar field.
"""

from .fp import make_field

BLS12_381_FQ_MODULUS = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
BLS12_381_FR_MODULUS = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

FQ381 = make_field("bls12_381_fq", BLS12_381_FQ_MODULUS)
FR381 = make_field("bls12_381_fr", BLS12_381_FR_MODULUS)

assert FQ381.nlimbs == 24 and FR381.nlimbs == 16
