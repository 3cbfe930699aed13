"""Generic verifier-gadget interface + harness (layer L6 core).

Counterpart of the reference's `src/constraints.rs`: the `ASVerifierGadget`
trait (11-50), the `AtomicASVerifierGadget` marker (53-60), the gadget test
harness's allocation split (107-204: vk constant, input instances + proof as
witnesses, the claimed new accumulator instance as public input) and
`print_costs_breakdown` (206-306).

The per-scheme gadget modules (hp_as_gadget, trivial_pc_as_gadget,
ipa_pc_as_gadget, r1cs_nark_as_gadget) register here, giving one uniform
entry point:

    verifier.synthesize_and_check("hp_as", curve, vk, inputs, olds, new, proof)
    verifier.print_costs_breakdown("hp_as", ...)
"""

from __future__ import annotations

from typing import Callable, Dict


class ASVerifierGadget:
    """Interface: re-expresses AccumulationScheme.verify as constraints.

    Implementations synthesise the verify relation into a GadgetCS; the
    harness checks satisfaction (the reference's Boolean-return +
    enforce_equal(TRUE) pattern collapses to direct enforcement here)."""

    def verify(self, g, vk, input_instances, old_accumulator_instances,
               new_accumulator_instance, proof):
        raise NotImplementedError


class AtomicASVerifierGadget(ASVerifierGadget):
    """Marker for gadgets of atomic schemes (reference constraints.rs:53-60)."""


_REGISTRY: Dict[str, object] = {}


def _load():
    if _REGISTRY:
        return _REGISTRY
    from . import (hp_as_gadget, ipa_pc_as_gadget, r1cs_nark_as_gadget,
                   trivial_pc_as_gadget)
    _REGISTRY.update({
        "hp_as": hp_as_gadget,
        "trivial_pc_as": trivial_pc_as_gadget,
        "ipa_pc_as": ipa_pc_as_gadget,
        "r1cs_nark_as": r1cs_nark_as_gadget,
    })
    return _REGISTRY


def synthesize_and_check(scheme: str, curve, vk, input_instances,
                         old_accumulator_instances, new_accumulator_instance,
                         proof) -> bool:
    """Full in-circuit verify; True iff the constraint system is satisfied."""
    mod = _load()[scheme]
    return mod.synthesize_and_check(
        curve, vk, input_instances, old_accumulator_instances,
        new_accumulator_instance, proof)


def costs_breakdown(scheme: str, curve, vk, input_instances,
                    old_accumulator_instances, new_accumulator_instance,
                    proof) -> dict:
    mod = _load()[scheme]
    return mod.costs_breakdown(
        curve, vk, input_instances, old_accumulator_instances,
        new_accumulator_instance, proof)


def print_costs_breakdown(scheme: str, curve, vk, input_instances,
                          old_accumulator_instances, new_accumulator_instance,
                          proof):
    """Mirrors reference src/constraints.rs:206-306's printed profile."""
    counts = costs_breakdown(scheme, curve, vk, input_instances,
                             old_accumulator_instances,
                             new_accumulator_instance, proof)
    print(f"Cost of allocating input instances: {counts['input_instances']}")
    print(f"Cost of allocating old accumulators: {counts['old_accumulators']}")
    print(f"Cost of allocating new accumulator: {counts['new_accumulator']}")
    print(f"Cost of allocating proof: {counts['proof']}")
    print(f"Cost of verify: {counts['verify']}")
    print(f"Total constraints: {counts['total']}")
    return counts
