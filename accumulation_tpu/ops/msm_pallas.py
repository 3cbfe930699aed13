"""Pallas TPU sweep kernel for the Pippenger bucket phase.

The slot-matrix sweep is the MSM's dominant cost: s sequential steps, each
a (W * NB)-lane batched mixed addition of gathered points into the bucket
accumulators.  At the XLA level the redundant-f32 field engine
(fields/fp8.py) is HBM-bound: every limb convolution materialises a
(nl8, nl8, lanes) outer product to main memory (measured 58 s vs the u32
engine's 3 s at 2^16 — experiments/profile_out.txt).  This kernel runs the
same arithmetic with the working set pinned on-chip:

  * bucket accumulators live in VMEM across the whole chunk (aliased
    in/out, no copies);
  * the lane axis is blocked (LANE_BLK) so each convolution intermediate is
    a ~1.5 MB VMEM tensor — Mosaic keeps the multiply/carry chains in
    vector registers / VMEM, never touching HBM;
  * the host-level `lax.scan` streams pre-gathered point chunks (an XLA
    gather per CHUNK sweep steps) through the kernel.

The kernel body is literally the fp8 group law (ops/msm8.add_mixed8) — the
engine's ops are pure jnp and compile under Mosaic unchanged, so the Pallas
and XLA paths share one verified arithmetic implementation.

Status (measured, v5e, 2^16/c=8/s=1280 — experiments/profile_out.txt):

  CHUNK=1,  LANE_BLK=128  : 4.62 s   (per-call overhead bound)
  CHUNK=16, LANE_BLK=128  : 4.34 s   (per-MATMUL overhead bound: the group
                                      law issues 44 tiny (78x1521)@(1521,128)
                                      MXU matmuls per block-add)
  CHUNK=8,  LANE_BLK=512  : 2.11 s   (4x wider matmuls, 2.06x faster)
  u32 XLA sweep (product) : ~0.8 s

The ceiling is structural: the conv-as-constant-matmul trick (SEL selection
matrix over the n^2 limb products) issues 78x the useful multiply work, so
even at full MXU utilisation it lands ~3x over the VPU u32 path's measured
3.1 G u32-mults/s — not enough to clear it after gather/launch costs.  The
kernel therefore stays OPT-IN (ACCUM_TPU_PALLAS_SWEEP=1 with
ACCUM_TPU_MSM_ENGINE=fp8); the next credible step is a VPU skew-reshape
body (fp8._mul_vpu) under Mosaic, which does only the useful 1521 f32 FMAs
per limb product.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.weierstrass import Affine, CurveSpec
from ..fields import fp8

import os as _os
LANE_BLK = int(_os.environ.get("ACCUM_TPU_PALLAS_LANE_BLK", "128"))
# sweep steps per pallas_call: amortises the per-call launch/DMA overhead
# (measured 3.6 ms/step at CHUNK=1 vs ~55 us of pure FLOPs).  The kernel
# iterates the chunk with lax.fori_loop, NOT a python unroll — a CHUNK-way
# unrolled body (~700 matmul ops) OOM-killed the remote Mosaic compile.
CHUNK = int(_os.environ.get("ACCUM_TPU_PALLAS_CHUNK", "16"))
# interpreter mode: lets the CPU test suite validate the kernel body
_INTERPRET = _os.environ.get("ACCUM_TPU_PALLAS_INTERPRET", "0") == "1"
# field-mul body: "mxu" = conv-as-bf16-matmul (78x work amplification,
# measured 2.11 s at its best tuning), "vpu" = skew-reshape f32 FMAs (only
# the useful 1521 products per limb conv)
_MUL_BODY = _os.environ.get("ACCUM_TPU_PALLAS_MUL", "mxu")


@functools.lru_cache(maxsize=None)
def _sweep_call(curve: CurveSpec, nl8: int, lanes: int, chunk: int):
    """Builds the pallas_call updating (3, nl8, lanes) bucket state with
    CHUNK gathered point batches.

    Field constants (p, p', sub pad, 3b) enter as an explicit (4, nl8)
    input — Pallas kernels may not close over materialised constants — and
    are installed in fp8's override context for the kernel trace."""
    from . import msm8

    n_blk = lanes // LANE_BLK

    def kernel(consts, sel, tq, tp, bx, by, bz, qx, qy, qinf, ox, oy, oz):
        ov = {
            "p8": consts[0], "pp8": consts[1], "sub_pad": consts[2],
            "b3": consts[3],
        }
        if _MUL_BODY == "mxu":
            ov["mxu_mats"] = (sel[:], tq[:], tp[:])
        elif _MUL_BODY == "vpu":
            # hybrid body: data*data conv as a VPU roll-accumulate (only
            # the useful n^2 FMAs), constant REDC convs as exact bf16
            # matmuls on the MXU (fp8._mul_hybrid)
            ov["hybrid_mats"] = (tq[:], tp[:])
        with fp8.override_consts(ov):
            acc = msm8.P8(bx[:], by[:], bz[:])

            def body(t, a):
                # dynamic index on the REF (untiled leading dim) — Mosaic
                # has no lowering for dynamic_slice on loaded arrays
                q = msm8.A8(qx[t], qy[t], qinf[t] > 0.5)
                return msm8.add_mixed8(curve, a, q)

            acc = jax.lax.fori_loop(0, chunk, body, acc)
            ox[:] = acc.x
            oy[:] = acc.y
            oz[:] = acc.z

    # index_map returns BLOCK indices (element offset = index * block_shape)
    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    state_spec = pl.BlockSpec((nl8, LANE_BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((chunk, nl8, LANE_BLK),
                              lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    inf_spec = pl.BlockSpec((chunk, LANE_BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    cs = fp8.consts8(curve.fq)
    b3_row = fp8._split8_int(
        (3 * curve.b % curve.fq.modulus)
        * (1 << (8 * nl8)) % curve.fq.modulus, nl8)
    consts_np = np.stack([cs["p8"], cs["pp8"], cs["sub_pad"], b3_row])
    sel_np, tq_np, tp_np = fp8.mxu_mats(curve.fq)

    def call(bx, by, bz, qx, qy, qinf):
        return pl.pallas_call(
            kernel,
            grid=(n_blk,),
            in_specs=[full(consts_np.shape), full(sel_np.shape),
                      full(tq_np.shape), full(tp_np.shape),
                      state_spec, state_spec, state_spec,
                      chunk_spec, chunk_spec, inf_spec],
            out_specs=[state_spec, state_spec, state_spec],
            out_shape=[jax.ShapeDtypeStruct((nl8, lanes), jnp.float32)] * 3,
            input_output_aliases={4: 0, 5: 1, 6: 2},
            # the group-law body's live temporaries + double-buffered chunk
            # blocks exceed the 16 MB default scoped-vmem budget at CHUNK=16
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(jnp.asarray(consts_np), jnp.asarray(sel_np), jnp.asarray(tq_np),
          jnp.asarray(tp_np), bx, by, bz, qx, qy, qinf)

    return call


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7))
def sweep_pallas(curve: CurveSpec, px, py, pinf, slots_t, s: int,
                 sentinel: int, chunk: int = None):
    """Run the bucket sweep on TPU via the Pallas kernel.

    px, py: (nl8, T) fp8 point tables (sentinel/doubled layout as built by
    msm8.bucket_phase8); pinf: (T,) bool; slots_t: (S, W, NB) int32 point
    indices; sentinel: a table index whose entry is the infinity marker.
    Returns P8 buckets of shape (nl8, W, NB)."""
    from . import msm8

    nl8 = px.shape[0]
    w, nb = slots_t.shape[1], slots_t.shape[2]
    lanes = w * nb
    lanes_pad = -(-lanes // LANE_BLK) * LANE_BLK
    n_sent = sentinel

    slots_flat = slots_t.reshape(s, lanes)
    if lanes_pad != lanes:
        # padded lanes gather the infinity sentinel — no-ops in the sweep
        sent = jnp.full((s, lanes_pad - lanes), jnp.int32(n_sent))
        slots_flat = jnp.concatenate([slots_flat, sent], axis=1)
    chunk = chunk or CHUNK
    s_pad = -(-s // chunk) * chunk
    if s_pad != s:
        # padded sweep steps add the infinity sentinel everywhere — no-ops
        pad = jnp.full((s_pad - s, lanes_pad), jnp.int32(n_sent))
        slots_flat = jnp.concatenate([slots_flat, pad], axis=0)
    slots_c = slots_flat.reshape(s_pad // chunk, chunk, lanes_pad)

    call = _sweep_call(curve, nl8, lanes_pad, chunk)
    pinf_f = pinf.astype(jnp.float32)

    def body(state, idx):
        bx, by, bz = state
        qx = jnp.transpose(px[:, idx], (1, 0, 2))     # (CHUNK, nl8, L)
        qy = jnp.transpose(py[:, idx], (1, 0, 2))
        qinf = pinf_f[idx]                             # (CHUNK, L)
        bx, by, bz = call(bx, by, bz, qx, qy, qinf)
        return (bx, by, bz), None

    zero = msm8.zero8(curve, (lanes_pad,))
    (bx, by, bz), _ = jax.lax.scan(body, (zero.x, zero.y, zero.z), slots_c)
    return msm8.P8(bx[:, :lanes].reshape(nl8, w, nb),
                   by[:, :lanes].reshape(nl8, w, nb),
                   bz[:, :lanes].reshape(nl8, w, nb))
