from . import weierstrass
from .weierstrass import Affine, Jacobian, CurveSpec, make_curve
from ..fields.pasta import FQ, FR

# The Pallas curve of the Pasta cycle: y^2 = x^3 + 5 over FQ, generator (-1, 2)
# (the instantiation used throughout the reference tests/examples, e.g.
# /root/reference/src/hp_as/mod.rs:1047-1050).
PALLAS = make_curve("pallas", FQ, FR, 5, -1, 2)

# Vesta — the cycle partner (base/scalar fields swapped, same b and
# generator).  Every scheme is generic over CurveSpec; for PCD recursion the
# next circuit layer runs over the partner curve.
VESTA = make_curve("vesta", FR, FQ, 5, -1, 2)
