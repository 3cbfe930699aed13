"""Round-5 /verify drive: full ipa_pc_as lifecycle + tamper probes (CPU)."""
import dataclasses

import numpy as np

from accumulation_tpu.core.accumulation import InstanceWitnessPair, MakeZK
from accumulation_tpu.core import errors
from accumulation_tpu.curves import PALLAS
from accumulation_tpu.fields import fp
from accumulation_tpu.ops import poly as poly_ops
from accumulation_tpu.pc import ipa_pc
from accumulation_tpu.schemes.ipa_pc_as import (
    AtomicASForInnerProductArgPC, InputInstance, PredicateIndex)
from accumulation_tpu.utils import serialize

curve = PALLAS
rng = np.random.default_rng(42)
deg = 11
scheme = AtomicASForInnerProductArgPC(curve)
pp = ipa_pc.setup(curve, deg)
pk, vk, dk = scheme.index(None, pp, PredicateIndex(deg, deg))


def make_input():
    coeffs = fp.random_elements(curve.fr, rng, (deg + 1,))
    point = fp.random_elements(curve.fr, rng, ())
    comm = ipa_pc.commit(curve, pk.ipa_ck, coeffs)
    value = poly_ops.evaluate(curve.fr, coeffs, point)
    proof = ipa_pc.open(curve, pk.ipa_ck, coeffs, comm, point)
    return InstanceWitnessPair(InputInstance(comm, point, value, proof), None)


# prove -> verify -> chain (feed accumulator back, zk second step) -> decide
acc, asp = scheme.prove(pk, [make_input()], [], MakeZK.Disabled())
inp2 = make_input()
acc2, asp2 = scheme.prove(pk, [inp2], [acc], MakeZK.Enabled(rng))
ok2 = scheme.verify(vk, [inp2.instance], [acc.instance], acc2.instance, asp2)
assert ok2, "chain verify failed"
assert scheme.decide(dk, acc2), "decide failed"
print("lifecycle: prove/verify/chain(zk)/decide OK")

# serialize/deserialize round trip
blob = serialize.serialize_ipa_accumulator(curve, acc2)
acc2b = serialize.deserialize_ipa_accumulator(curve, blob)
assert serialize.serialize_ipa_accumulator(curve, acc2b) == blob
print("serialize round-trip OK,", len(blob), "bytes")

# tamper probe: corrupt the accumulator's claimed evaluation
bad_inst = dataclasses.replace(
    acc2.instance, evaluation=fp.random_elements(curve.fr, rng, ()))
assert not scheme.verify(vk, [inp2.instance], [acc.instance], bad_inst,
                         asp2), "tampered accumulator accepted!"
print("tamper probe: verify rejects OK")

# truncated blob -> clean error
try:
    serialize.deserialize_ipa_accumulator(curve, blob[:-7])
    print("TRUNCATION NOT DETECTED")
except Exception as e:
    print("truncation ->", type(e).__name__, "OK")

# malformed input -> typed error
try:
    bad = make_input()
    bad2 = InstanceWitnessPair(
        dataclasses.replace(bad.instance, ipa_proof=None), None)
    scheme.prove(pk, [bad2], [], MakeZK.Disabled())
    print("MALFORMED INPUT NOT DETECTED")
except errors.MalformedInput:
    print("malformed input -> MalformedInput OK")
print("VERIFY DRIVE PASS")
