from . import fp
from .fp import FieldSpec, make_field, NLIMBS, LIMB_BITS
from .pasta import FQ, FR
