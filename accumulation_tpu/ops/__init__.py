from . import poseidon, sponge
