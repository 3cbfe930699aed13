from . import sponge_device, hp_prove_fused
