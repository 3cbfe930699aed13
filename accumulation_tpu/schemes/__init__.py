from . import common, hp_as, ipa_pc_as, r1cs_nark, r1cs_nark_as, trivial_pc_as
from .hp_as import ASForHadamardProducts
from .ipa_pc_as import AtomicASForInnerProductArgPC
from .r1cs_nark import R1CSNark
from .r1cs_nark_as import ASForR1CSNark
from .trivial_pc_as import ASForTrivialPC
