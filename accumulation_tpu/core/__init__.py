from . import accumulation, errors
from .accumulation import (AccumulationScheme, AtomicAccumulationScheme,
                           InstanceWitnessPair, Accumulator, Input, MakeZK)
