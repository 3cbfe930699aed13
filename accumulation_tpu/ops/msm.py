"""Multi-scalar multiplication (the throughput core, SURVEY.md §7.3).

TPU-native Pippenger.  The reference's MSMs live in arkworks `ark-ec`
(`PedersenCommitment::commit`, IPA folding; reference call sites
src/hp_as/mod.rs:196-214,377 and ark-poly-commit's ipa_pc open/check).  GPUs
implement Pippenger with atomics/scatter into buckets; TPUs have neither, so
the bucket accumulation is reformulated as a *dense slot matrix*:

  1. split each 256-bit scalar into W = 256/c windows of c-bit digits;
  2. per window, sort point indices by digit (XLA sort), compute each point's
     rank within its digit segment, and scatter indices into a static
     ``(W, 2^c, S)`` slot matrix (S = max bucket occupancy, host-synced and
     bucketed to a power of two to bound recompiles);
  3. sweep slots t = 0..S-1: one *batched mixed addition* of the gathered
     points into all W * 2^c bucket accumulators at once — the group adds
     run 8k+ lanes wide on the VPU with zero dynamic control flow;
  4. per window, aggregate sum_v v * B_v with a reverse associative scan
     (suffix sums) + tree reduction — both log-depth;
  5. Horner-combine windows with c doublings per step.

Total group-op work matches classic Pippenger (~W*N adds); every step is a
wide vectorised op.  Scalars whose digit is 0 never enter a bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, Jacobian, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE

SMALL_N_THRESHOLD = 96

# Fat scan steps amortise per-step launch latency on TPU; on the XLA:CPU
# test backend the unrolled bodies inflate compile time (and very large
# graphs have segfaulted the CPU compiler late in long sessions), so the
# unroll factors are platform-aware.
import os as _os
_ON_CPU = "cpu" in _os.environ.get("JAX_PLATFORMS", "")
SWEEP_CHUNK = 2 if _ON_CPU else 16
AGG_UNROLL_N = 1 if _ON_CPU else 8
DBL_UNROLL_N = 1 if _ON_CPU else 8


def _pick_c(n: int) -> int:
    if n >= 1 << 16:
        return 8
    return 4


@functools.partial(jax.jit, static_argnums=(0, 2))
def _digits_and_sort(curve: CurveSpec, scalars_mont, c: int):
    """-> (sorted_digits (W,N), perm (W,N), ranks (W,N), max_count ())."""
    bits = fp.canonical_bits(curve.fr, scalars_mont)  # (N, 256)
    n = bits.shape[0]
    w = 256 // c
    weights = (jnp.uint32(1) << jnp.arange(c, dtype=jnp.uint32)).astype(jnp.int32)
    digits = jnp.sum(
        bits.reshape(n, w, c).astype(jnp.int32) * weights[None, None, :],
        axis=-1)  # (N, W) — integer ops only (TPU float dots are inexact)
    digits_t = digits.T  # (W, N)
    perm = jnp.argsort(digits_t, axis=-1, stable=True)
    sorted_digits = jnp.take_along_axis(digits_t, perm, axis=-1)
    first = jax.vmap(
        lambda sd: jnp.searchsorted(sd, sd, side="left")
    )(sorted_digits)
    ranks = jnp.arange(n)[None, :] - first
    nonzero = sorted_digits > 0
    count_in_bucket = jnp.where(nonzero, ranks + 1, 0)
    max_count = jnp.max(count_in_bucket)
    return sorted_digits, perm, ranks, max_count


@functools.partial(jax.jit, static_argnums=(0, 2))
def _digits_and_ranks(curve: CurveSpec, scalars_mont, c: int):
    """Sort-free digit/rank extraction: -> (digits (W,N), ranks (W,N),
    max_count ()).

    rank[i] = #\\{j < i : digit_j == digit_i\\} per window, computed with a
    blocked one-hot cumsum — replaces the argsort+searchsorted path, whose
    XLA:TPU sort measured 620 ms at N=2^16 (experiments/profile_out.txt),
    ~100x the arithmetic cost of this formulation."""
    bits = fp.canonical_bits(curve.fr, scalars_mont)  # (N, 256)
    n = bits.shape[0]
    w = 256 // c
    nb = 1 << c
    weights = (jnp.uint32(1) << jnp.arange(c, dtype=jnp.uint32)).astype(jnp.int32)
    digits = jnp.sum(
        bits.reshape(n, w, c).astype(jnp.int32) * weights[None, None, :],
        axis=-1).T  # (W, N)

    ch = 1024
    pad = (-n) % ch
    nb_pad = n + pad

    def per_window(_, dw):
        dpad = jnp.concatenate([dw, jnp.full((pad,), -1, jnp.int32)]) \
            if pad else dw
        onehot = (dpad[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
                  ).astype(jnp.int32)                      # (Np, NB)
        blocks = onehot.reshape(nb_pad // ch, ch, nb)
        within = jnp.cumsum(blocks, axis=1)                # inclusive
        block_tot = within[:, -1, :]
        offs = jnp.cumsum(block_tot, axis=0) - block_tot   # exclusive
        incl = (within + offs[:, None, :]).reshape(nb_pad, nb)
        rank = jnp.take_along_axis(
            incl[:n], jnp.clip(dw[:, None], 0, nb - 1), axis=1)[:, 0] - 1
        counts = incl[n - 1]
        wmax = jnp.max(counts[1:]) if nb > 1 else jnp.int32(0)
        return None, (rank, wmax)

    _, (ranks, wmaxes) = jax.lax.scan(per_window, None, digits)
    return digits, ranks, jnp.max(wmaxes)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _bucket_phase(curve: CurveSpec, points: Affine, sorted_digits, perm_ranks,
                  c: int, s: int, unrolls=None) -> Jacobian:
    """Builds the slot matrix and returns the full MSM result.

    unrolls: optional (sweep_chunk, agg_unroll, dbl_unroll) static override
    (e.g. the bench's CPU baseline forces the thin variant)."""
    sweep_chunk, agg_unroll_n, dbl_unroll_n = (
        unrolls if unrolls is not None
        else (SWEEP_CHUNK, AGG_UNROLL_N, DBL_UNROLL_N))
    perm, ranks = perm_ranks
    w = 256 // c
    nb = 1 << c
    n = perm.shape[-1]

    # --- slot matrix: (W, 2^c, S) of point indices, sentinel = n ------------
    valid = (sorted_digits > 0) & (ranks < s)
    lin_idx = (
        jnp.arange(w)[:, None] * (nb * s)
        + sorted_digits * s
        + jnp.clip(ranks, 0, s - 1)
    )
    lin_idx = jnp.where(valid, lin_idx, w * nb * s)  # drop slot
    slot_flat = jnp.full((w * nb * s + 1,), n, dtype=jnp.int32)
    slot_flat = slot_flat.at[lin_idx.reshape(-1)].set(
        perm.reshape(-1).astype(jnp.int32), mode="drop"
    )
    slots = slot_flat[: w * nb * s].reshape(w, nb, s)

    # --- points with infinity sentinel at index n ---------------------------
    nl = points.x.shape[-1]
    px = jnp.concatenate([points.x, jnp.zeros((1, nl), DTYPE)], axis=0)
    py = jnp.concatenate([points.y, jnp.zeros((1, nl), DTYPE)], axis=0)
    pinf = jnp.concatenate([points.inf, jnp.ones((1,), bool)], axis=0)

    # Slot-major layout (t leading) so each sweep step gathers a contiguous
    # (chunk, W, 2^c) block; chunking amortises gather overhead while keeping
    # the materialised working set bounded (a full pre-gather would be
    # S * W * 2^c * 192 B — gigabytes at large N).
    slots_t = jnp.transpose(slots, (2, 0, 1))  # (S, W, 2^c)
    chunk = min(s, sweep_chunk)
    assert s % chunk == 0
    slots_c = slots_t.reshape(s // chunk, chunk, w, nb)

    def body(acc, idx_block):
        qx = px[idx_block]      # (chunk, W, 2^c, L)
        qy = py[idx_block]
        qinf = pinf[idx_block]
        for t in range(chunk):
            acc = wst.jac_add_affine(
                curve, acc, Affine(qx[t], qy[t], qinf[t]))
        return acc, None

    init = wst.jacobian_zero(curve, (w, nb))
    buckets, _ = (jax.lax.scan(body, init, slots_c)
                  if s > 0 else (init, None))

    # --- per-window weighted bucket aggregation -----------------------------
    # sum_{v>=1} v*B_v via the running/total trick, scanning buckets from the
    # top: running += B_v; total += running.  The inner unroll packs several
    # buckets per scan step — the narrow (W-wide) steps are launch-latency
    # bound on TPU, so fewer/fatter steps win.
    AGG_UNROLL = agg_unroll_n
    n_agg = nb - 1
    pad_agg = (-n_agg) % AGG_UNROLL
    # process buckets nb-1 .. 1; pad with zero-bucket indices (bucket 0 is
    # the identity by construction, so extra adds of B_0 are no-ops)
    order = jnp.concatenate(
        [jnp.arange(nb - 1, 0, -1), jnp.zeros((pad_agg,), jnp.int32)])
    order = order.reshape(-1, AGG_UNROLL)

    def agg_body(carry, vs):
        running, total = carry
        for t in range(AGG_UNROLL):
            v = vs[t]
            valid = jnp.broadcast_to(v > 0, (w,))  # padded steps are no-ops
            bv = Jacobian(buckets.x[:, v], buckets.y[:, v], buckets.z[:, v])
            running = wst._where_pt(
                valid, wst.jac_add(curve, running, bv), running)
            total = wst._where_pt(
                valid, wst.jac_add(curve, total, running), total)
        return (running, total), None

    init_agg = (wst.jacobian_zero(curve, (w,)), wst.jacobian_zero(curve, (w,)))
    (_, window_sums), _ = jax.lax.scan(agg_body, init_agg, order)

    # --- window combine: parallel-weighted, then log-depth tree -------------
    # result = sum_w 2^{c w} S_w.  Doubling chains run batched across all W
    # windows at once with per-window masks (window w doubles c*w times),
    # then one tree reduction — O(c*W) doublings of W-wide lanes in
    # ceil(c*W / UNROLL) steps instead of per-window sequential Horner.
    total_dbl = c * (w - 1)
    DBL_UNROLL = dbl_unroll_n
    win_idx = jnp.arange(w)

    def dbl_body(acc, i_base):
        for t in range(DBL_UNROLL):
            i = i_base + t
            mask = i < (c * win_idx)
            doubled = wst.jac_double(curve, acc)
            acc = wst._where_pt(mask, doubled, acc)
        return acc, None

    n_dbl_steps = (total_dbl + DBL_UNROLL - 1) // DBL_UNROLL
    acc, _ = jax.lax.scan(
        dbl_body, window_sums,
        jnp.arange(n_dbl_steps) * DBL_UNROLL)
    return wst._tree_reduce(curve, acc)


def msm(curve: CurveSpec, points: Affine, scalars_mont, c: int = None) -> Jacobian:
    """MSM: sum_i scalars[i] * points[i] -> Jacobian point.

    points: (N,) Affine, scalars_mont: (N, NLIMBS) Montgomery Fr.
    Small N uses the bit-serial kernel (one jit, no host sync); large N uses
    Pippenger with one host sync for the slot-matrix size.
    """
    n = points.x.shape[0]
    if n == 0:
        return wst.jacobian_zero(curve, ())
    if n <= SMALL_N_THRESHOLD:
        return wst.msm_bitserial(curve, points, scalars_mont)
    if c is None:
        c = _pick_c(n)
    if 256 % c != 0:
        raise ValueError(f"window size c={c} must divide 256 "
                         "(a non-divisor would silently drop top scalar bits)")
    sorted_digits, perm, ranks, max_count = _digits_and_sort(
        curve, scalars_mont, c
    )
    s = int(max_count)  # host sync (one int)
    if s == 0:
        return wst.jacobian_zero(curve, ())
    s = 1 << (s - 1).bit_length()  # bucket to pow2 to bound recompiles
    s = min(s, n)
    return _bucket_phase(curve, points, sorted_digits, (perm, ranks), c, s)


def msm_batched(curve: CurveSpec, points: Affine, scalars_mont) -> Jacobian:
    """Batched MSM sharing one point set: scalars (B, N, NLIMBS) -> (B,) Jacobian.

    Used for committing many equal-length vectors under one Pedersen key
    (e.g. the 2m-2 t-vec commitments, reference src/hp_as/mod.rs:354-388).
    """
    n = points.x.shape[0]
    b = scalars_mont.shape[0]
    if b == 0:
        return wst.jacobian_zero(curve, (0,))
    if n <= SMALL_N_THRESHOLD:
        return jax.vmap(lambda s: wst.msm_bitserial(curve, points, s))(scalars_mont)
    c = _pick_c(n)
    sorted_digits, perm, ranks, max_count = jax.vmap(
        lambda s: _digits_and_sort(curve, s, c)
    )(scalars_mont)
    s = int(jnp.max(max_count))
    if s == 0:
        return wst.jacobian_zero(curve, (b,))
    s = min(1 << (s - 1).bit_length(), n)
    return jax.vmap(
        lambda sd, pe, ra: _bucket_phase(curve, points, sd, (pe, ra), c, s)
    )(sorted_digits, perm, ranks)
