"""Generic accumulation-chain test harness.

Mirrors the reference's `ASTests::test_template` and the six canonical input
shapes (/root/reference/src/lib.rs:334-459): per iteration, for each entry in
`num_inputs_per_iteration`, prove with that many fresh inputs plus all
accumulators produced so far in the iteration, verify the result, and decide
the last accumulator of the iteration.

`NUM_ITERATIONS` is 50 in the reference; here it defaults to 2 (override with
ACCUM_TEST_ITERS) — each iteration exercises the identical code path and the
compile cache makes later iterations cheap, but CI time matters.
"""

from __future__ import annotations

import os

from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK

NUM_ITERATIONS = int(os.environ.get("ACCUM_TEST_ITERS", "2"))


def pinned_iters(default: int) -> int:
    """Iteration count for chain shapes that pin a cheap default in CI.

    An explicit ACCUM_TEST_ITERS always wins, so the 50-deep nightly run
    (reference NUM_ITERATIONS, /root/reference/src/lib.rs:273) exercises
    every shape at full depth."""
    if "ACCUM_TEST_ITERS" in os.environ:
        return int(os.environ["ACCUM_TEST_ITERS"])
    return default


def test_template(scheme, keys, generate_inputs, num_inputs_per_iteration,
                  make_zk, rng, num_iterations=None, sponge=None):
    """Returns True iff every verify and decide in the chain passed."""
    pk, vk, dk = keys
    num_iterations = num_iterations or NUM_ITERATIONS
    total = num_iterations * sum(num_inputs_per_iteration)
    inputs = generate_inputs(total)
    assert len(inputs) == total

    start = 0
    for _ in range(num_iterations):
        old_accumulators = []
        for num in num_inputs_per_iteration:
            batch = inputs[start:start + num]
            start += num
            accumulator, proof = scheme.prove(
                pk, batch, old_accumulators,
                MakeZK.Enabled(rng) if make_zk else MakeZK.Disabled(),
                sponge=None if sponge is None else sponge(),
            )
            ok = scheme.verify(
                vk,
                [b.instance for b in batch],
                [a.instance for a in old_accumulators],
                accumulator.instance,
                proof,
                sponge=None if sponge is None else sponge(),
            )
            if not ok:
                return False
            old_accumulators.append(accumulator)
        assert old_accumulators
        if not scheme.decide(dk, old_accumulators[-1]):
            return False
    return True


# The six canonical shapes (reference src/lib.rs:398-459):
SINGLE_INPUT_INIT = [1]
MULTIPLE_INPUTS_INIT = [3]
SIMPLE_ACCUMULATION = [1, 1]
MULTIPLE_INPUTS_ACCUMULATION = [1, 1, 2, 3]
ACCUMULATORS_ONLY = [1, 0, 0, 0]
NO_INPUTS_INIT = [0]


IPA_DEGREE = 11  # the reference's ipa test degree (src/ipa_pc_as/mod.rs:859)


def make_ipa_input_gen(curve, pk, rng, make_zk, degree=IPA_DEGREE):
    """Real IPA opening-claim generator (commit/evaluate/open), shared by the
    scheme chain tests and the gadget tests (mirrors the reference's
    ASTestInput for ipa_pc_as, src/ipa_pc_as/mod.rs:942-1004)."""
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import poly as poly_ops
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.schemes.ipa_pc_as import InputInstance

    ck = pk.ipa_ck

    def generate(n):
        out = []
        for _ in range(n):
            coeffs = fp.random_elements(curve.fr, rng, (degree + 1,))
            point = fp.random_elements(curve.fr, rng, ())
            value = poly_ops.evaluate(curve.fr, coeffs, point)
            if make_zk:
                omega = fp.random_elements(curve.fr, rng, ())
                comm = ipa_pc.commit(curve, ck, coeffs, omega)
                proof = ipa_pc.open(curve, ck, coeffs, comm, point,
                                    rand=omega, hiding=True, rng=rng)
            else:
                comm = ipa_pc.commit(curve, ck, coeffs)
                proof = ipa_pc.open(curve, ck, coeffs, comm, point)
            inst = InputInstance(comm, point, value, proof)
            out.append(InstanceWitnessPair(inst, None))
        return out
    return generate


def gadget_chain_template(scheme_name, scheme, keys, generate_inputs,
                          num_inputs_per_iteration, make_zk, rng):
    """Gadget analog of `test_template` at the reference's gadget harness
    shapes (/root/reference/src/constraints.rs:62-204, NUM_ITERATIONS=1):
    run the native chain and re-verify EVERY accumulation step in-circuit.
    Returns True iff every native verify and every gadget synthesis passed."""
    from accumulation_tpu.constraints import verifier

    pk, vk, dk = keys
    inputs = generate_inputs(sum(num_inputs_per_iteration))
    start = 0
    old_accumulators = []
    for num in num_inputs_per_iteration:
        batch = inputs[start:start + num]
        start += num
        accumulator, proof = scheme.prove(
            pk, batch, old_accumulators,
            MakeZK.Enabled(rng) if make_zk else MakeZK.Disabled())
        if not scheme.verify(vk, [b.instance for b in batch],
                             [a.instance for a in old_accumulators],
                             accumulator.instance, proof):
            return False
        if not verifier.synthesize_and_check(
                scheme_name, scheme.curve, vk,
                [b.instance for b in batch],
                [a.instance for a in old_accumulators],
                accumulator.instance, proof):
            return False
        old_accumulators.append(accumulator)
    return scheme.decide(dk, old_accumulators[-1])
