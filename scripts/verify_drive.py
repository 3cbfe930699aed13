"""End-to-end verification drive for the library surface (see
.claude/skills/verify/SKILL.md).

Full ipa_pc_as lifecycle at the reference test degree: setup/index ->
prove -> verify -> chain with zk (accumulator fed back) -> serialize /
deserialize round-trip -> decide; then tamper probes (verify must return
False; truncated blob must raise cleanly).

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/verify_drive.py
"""

import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import harness_path  # noqa: F401  (adds tests/ to sys.path)
    import harness
    from accumulation_tpu.core.accumulation import MakeZK
    from accumulation_tpu.curves import PALLAS
    from accumulation_tpu.pc import ipa_pc
    from accumulation_tpu.schemes.ipa_pc_as import (
        AtomicASForInnerProductArgPC, PredicateIndex)
    from accumulation_tpu.utils import serialize as ser

    rng = np.random.default_rng(7)
    curve = PALLAS
    scheme = AtomicASForInnerProductArgPC(curve)
    degree = harness.IPA_DEGREE
    pp = ipa_pc.setup(curve, degree)
    pk, vk, dk = scheme.index(None, pp, PredicateIndex(degree, degree))
    print("[drive] setup/index ok")

    gen = harness.make_ipa_input_gen(curve, pk, rng, make_zk=False)
    inputs = gen(2)
    acc, proof = scheme.prove(pk, inputs, [], MakeZK.Disabled())
    ok = scheme.verify(vk, [i.instance for i in inputs], [],
                       acc.instance, proof)
    assert ok, "fresh-input verify failed"
    print("[drive] prove/verify ok")

    # chain: feed the accumulator back with zk enabled
    gen_zk = harness.make_ipa_input_gen(curve, pk, rng, make_zk=True)
    inputs2 = gen_zk(1)
    acc2, proof2 = scheme.prove(pk, inputs2, [acc], MakeZK.Enabled(rng))
    ok = scheme.verify(vk, [i.instance for i in inputs2], [acc.instance],
                       acc2.instance, proof2)
    assert ok, "chained zk verify failed"
    print("[drive] zk chain step ok")

    # serialize / deserialize round-trip, then decide the restored acc
    blob = ser.serialize_ipa_accumulator(curve, acc2)
    restored = ser.deserialize_ipa_accumulator(curve, blob)
    blob2 = ser.serialize_ipa_accumulator(curve, restored)
    assert blob == blob2, "serialize round-trip not byte-stable"
    assert scheme.decide(dk, restored), \
        "decide failed on restored accumulator"
    print(f"[drive] serialize round-trip + decide ok ({len(blob)} bytes)")

    # tamper probe 1: corrupt the accumulator instance -> verify False
    from dataclasses import replace
    import jax.numpy as jnp
    bad_val = jnp.asarray(np.asarray(acc2.instance.ipa_commitment.x)) \
        .at[..., 0].add(1)
    bad_x = type(acc2.instance.ipa_commitment)(
        bad_val, acc2.instance.ipa_commitment.y,
        acc2.instance.ipa_commitment.inf)
    bad_inst = replace(acc2.instance, ipa_commitment=bad_x)
    assert not scheme.verify(vk, [i.instance for i in inputs2],
                             [acc.instance], bad_inst, proof2), \
        "tampered accumulator passed verify"
    print("[drive] tamper probe (bad accumulator) rejected ok")

    # tamper probe 2: truncated blob -> clean error
    try:
        ser.deserialize_ipa_accumulator(curve, blob[:-7])
        raise AssertionError("truncated blob deserialized")
    except AssertionError:
        raise
    except Exception as e:
        print(f"[drive] truncated blob rejected ok ({type(e).__name__})")

    print("VERIFY DRIVE PASS")


if __name__ == "__main__":
    # make the repo root + tests/harness.py importable without pytest
    import os
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tests"))
    sys.modules["harness_path"] = type(sys)("harness_path")
    main()
