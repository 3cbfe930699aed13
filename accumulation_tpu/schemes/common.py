"""Shared helpers for the scheme layer (host-orchestrated drivers).

The scheme drivers orchestrate jitted device kernels and a host-side
Fiat-Shamir sponge.  These helpers bridge the two: batch conversions of limb
tensors to python ints for absorption, stacking of per-input pytrees, and
challenge conversion back to device scalars.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS
from ..ops.sponge import PoseidonSponge


def stack_affine(pts: Sequence[Affine]) -> Affine:
    return Affine(
        jnp.stack([p.x for p in pts]),
        jnp.stack([p.y for p in pts]),
        jnp.stack([p.inf for p in pts]),
    )


def cat_affine(parts: Sequence[Affine]) -> Affine:
    """Concatenate already-batched Affine arrays along the leading axis."""
    return Affine(
        jnp.concatenate([p.x for p in parts], axis=0),
        jnp.concatenate([p.y for p in parts], axis=0),
        jnp.concatenate([p.inf for p in parts], axis=0),
    )


def unstack_affine(pts: Affine) -> List[Affine]:
    n = pts.x.shape[0]
    return [Affine(pts.x[i], pts.y[i], pts.inf[i]) for i in range(n)]


def affine_ints(curve: CurveSpec, pt: Affine):
    """Single affine point -> (x, y) ints or None (host sync)."""
    if pt.x.ndim == 1:
        batched = Affine(pt.x[None], pt.y[None], pt.inf[None])
        return wst.affine_to_ints(curve, batched)[0]
    return wst.affine_to_ints(curve, pt)


def absorb_affine(sponge: PoseidonSponge, curve: CurveSpec, pt: Affine):
    sponge.absorb_point(affine_ints(curve, pt))


def absorb_affine_list(sponge: PoseidonSponge, curve: CurveSpec, pts: Affine):
    """pts: batched affine (n,); absorbs each in order (one host sync)."""
    for p in wst.affine_to_ints(curve, pts):
        sponge.absorb_point(p)


def scalar_int(spec, x) -> int:
    return fp.to_int(spec, x)


def scalar_ints(spec, xs) -> List[int]:
    return fp.array_to_ints(spec, xs)


def scalars_from_ints(spec, xs):
    return fp.array_from_ints(spec, xs)


def scalar_from_int(spec, x):
    return fp.from_int(spec, x)


def fr_zero():
    return jnp.zeros((NLIMBS,), jnp.uint32)


def fr_zeros(shape):
    return jnp.zeros(tuple(shape) + (NLIMBS,), jnp.uint32)
