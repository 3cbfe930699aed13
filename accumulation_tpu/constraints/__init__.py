from . import r1cs, gadgets, nonnative
# gadget modules import from ..schemes; import them directly
# (accumulation_tpu.constraints.hp_as_gadget etc.) to avoid import cycles.
