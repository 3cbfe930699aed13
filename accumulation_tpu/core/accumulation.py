"""The accumulation-scheme core API (layer L4).

Mirrors the reference's `AccumulationScheme` trait (src/lib.rs:163-249) and
shared data structures (src/data_structures.rs): an accumulation prover folds
a batch of *inputs* plus *old accumulators* into one new accumulator and a
proof; the verifier checks the fold cheaply; the decider checks the final
accumulator, transitively certifying every folded input.

Python/TPU shape: schemes are stateless singletons over a `CurveSpec`;
instances/witnesses/proofs are dataclass pytrees of device limb tensors.
`make_zk` is (enabled, numpy rng) instead of the Rust `MakeZK` enum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Generic, List, Optional, Sequence, Tuple, TypeVar

import numpy as np

Instance = TypeVar("Instance")
Witness = TypeVar("Witness")


@dataclass
class InstanceWitnessPair(Generic[Instance, Witness]):
    """Reference `InstanceWitnessPair` (src/data_structures.rs:47-106)."""

    instance: Instance
    witness: Witness

    @staticmethod
    def instances(pairs: Sequence["InstanceWitnessPair"]) -> List[Any]:
        return [p.instance for p in pairs]

    @staticmethod
    def witnesses(pairs: Sequence["InstanceWitnessPair"]) -> List[Any]:
        return [p.witness for p in pairs]


Accumulator = InstanceWitnessPair
Input = InstanceWitnessPair


@dataclass
class MakeZK:
    """Reference `MakeZK` (src/data_structures.rs:148-164)."""

    enabled: bool
    rng: Optional[np.random.Generator] = None

    @staticmethod
    def Enabled(rng: np.random.Generator) -> "MakeZK":
        return MakeZK(True, rng)

    @staticmethod
    def Disabled() -> "MakeZK":
        return MakeZK(False, None)

    def into_components(self):
        return self.enabled, self.rng


class AccumulationScheme:
    """Abstract accumulation scheme (reference src/lib.rs:163-249).

    Concrete schemes implement:
      setup(rng) -> public_params
      index(public_params, predicate_params, predicate_index)
          -> (prover_key, verifier_key, decider_key)
      prove(pk, inputs, old_accumulators, make_zk, sponge=None)
          -> (Accumulator, proof)
      verify(vk, input_instances, old_accumulator_instances,
             new_accumulator_instance, proof, sponge=None) -> bool
      decide(dk, accumulator, sponge=None) -> bool
    """

    def setup(self, rng):
        raise NotImplementedError

    def index(self, public_params, predicate_params, predicate_index):
        raise NotImplementedError

    def prove(self, prover_key, inputs, old_accumulators, make_zk, sponge=None):
        raise NotImplementedError

    def verify(self, verifier_key, input_instances, old_accumulator_instances,
               new_accumulator_instance, proof, sponge=None):
        raise NotImplementedError

    def decide(self, decider_key, accumulator, sponge=None):
        raise NotImplementedError


class AtomicAccumulationScheme(AccumulationScheme):
    """Marker: witnesses are trivial `()` so verifiers see whole accumulators
    (reference src/lib.rs:258-261)."""
