from . import pedersen, trivial_pc
