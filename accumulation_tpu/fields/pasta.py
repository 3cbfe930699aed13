"""The Pasta (Pallas/Vesta) curve fields.

The reference instantiates every scheme over the Zcash "Pallas" curve
(`ark_pallas::Affine`, constraint field = its base field Fq; see reference
src/hp_as/mod.rs:1047-1050).  Moduli from the published Pasta specification.

Naming: we follow arkworks' convention for ark-pallas —
  Fq = the curve's BASE field (the sponge / constraint field CF),
  Fr = the curve's SCALAR field.
"""

from .fp import make_field

# Base field of the Pallas curve (a.k.a. "Fp" of Pasta; arkworks calls it Fq).
PALLAS_FQ_MODULUS = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
# Scalar field of the Pallas curve (= base field of Vesta).
PALLAS_FR_MODULUS = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001

FQ = make_field("pallas_fq", PALLAS_FQ_MODULUS)
FR = make_field("pallas_fr", PALLAS_FR_MODULUS)
