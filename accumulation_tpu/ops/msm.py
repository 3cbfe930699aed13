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

Slot-bound planning (_plan_split): the k+r signed recode makes bulk
windows uniform but leaves the TOP window structurally hot (~2x max
occupancy), so a shared slot bound pays ~2x sweep depth in every window.
When profitable the top window is split into replica rows of bulk depth
(virtual windows sharing the top weight via per-row dbl_counts) — sweep
work W*s_top -> (W+reps-1)*s_bulk, ~1.9x less at 2^16/c=8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import weierstrass as wst
from ..curves.weierstrass import Affine, Projective, CurveSpec
from ..fields import fp
from ..fields.fp import NLIMBS, DTYPE, LIMB_BITS, LIMB_MASK

SMALL_N_THRESHOLD = 96
SPLIT_MIN_N = 1024  # below this the sweep is not the bound; keep one layout

# Fat scan steps amortise per-step launch latency on TPU; on the XLA:CPU
# test backend the unrolled bodies inflate compile time (and very large
# graphs have segfaulted the CPU compiler late in long sessions), so the
# unroll factors are platform-aware.
#
# TPU default history: chunk 16 until round 4.  The 16-step 2^16 sweep
# graph compiled on the 2026-08-19 deployment but OOM-SIGKILLs the
# "chipless" AOT compile helper of the 2026-08-20 one (r03 bench_s16.err;
# reproduced twice in r04) — and when the helper dies mid-request the
# client can HANG indefinitely, wedging the whole relay.  Measured at
# 2^16/c=8 the (4, 2, 2) graphs are also slightly FASTER (36.5k vs 35.3k
# pts/s: thinner bodies pipeline better at these shapes), so small unrolls
# are now the TPU default; raise via env on deployments with a fatter
# compile budget if profiling ever favours it.
import os as _os
_ON_CPU = "cpu" in _os.environ.get("JAX_PLATFORMS", "")
SWEEP_CHUNK = int(_os.environ.get(
    "ACCUM_TPU_SWEEP_CHUNK", "2" if _ON_CPU else "4"))
AGG_UNROLL_N = int(_os.environ.get(
    "ACCUM_TPU_AGG_UNROLL", "1" if _ON_CPU else "2"))
DBL_UNROLL_N = int(_os.environ.get(
    "ACCUM_TPU_DBL_UNROLL", "1" if _ON_CPU else "2"))


def _pick_c(n: int) -> int:
    if n >= 1 << 16:
        return 8
    return 4


# Engine selection for the bucket phase.  The redundant-f32 engine
# (ops/msm8) replaces XLA's emulated u32 multiplies with exact float
# arithmetic; measured at the XLA level its outer-product convolutions are
# HBM-materialization-bound (58 s vs 3 s for u32 at 2^16 — profile_out.txt),
# so "auto" stays on u32 until the Pallas sweep kernel (VMEM-resident
# convolutions) carries it.
# engine selection: "auto"/"u32" = the point-major u32 engine (default —
# compiles in minutes everywhere), "fp8" = the experimental f32 engine
# (+ opt-in Pallas).  The round-1/2 lane-major (limb-leading) engine was
# RETIRED to experiments/msm_lanes.py: it measured 1.7x the point-major
# layout once compiled (cross-checked vs python-int ground truth,
# experiments/check_lanes.py), but its big unrolled graphs never became
# cold-compile-feasible (XLA:CPU ~25 min for one n=256 graph set; a cold
# remote TPU compile of the 2^16 split-sweep graph ran >40 min without
# completing).  Its layout insight — limb-major tensors keep the VPU
# lanes full — is the design basis for the planned Pallas sweep kernel
# (ops/msm_pallas.py status block).
_MSM_ENGINE = _os.environ.get("ACCUM_TPU_MSM_ENGINE", "auto")


def _use_fp8_engine() -> bool:
    if _MSM_ENGINE == "fp8":
        return True
    return False


def _quantize_slots(s: int, n: int) -> int:
    """Round the host-synced slot bound up to a quarter-octave step.

    Pure powers of two waste up to 2x sweep work when the true max
    occupancy just crosses a boundary; quarter steps keep the number of
    distinct compiled variants bounded (4 per octave) while capping the
    overshoot at 12.5%.  Steps stay multiples of 16 (the sweep chunk)."""
    s = max(s, 16)
    p2 = 1 << (s - 1).bit_length()
    if p2 >= 128:
        for num in (5, 6, 7, 8):
            cand = p2 * num // 8
            if cand >= s:
                return min(cand, n)
    return min(p2, n)


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
def _signed_digits_and_ranks(curve: CurveSpec, scalars_mont, c: int):
    """Signed-digit (window-NAF-style) recoding of k + r, + sort-free ranks.

    -> (mag (W,N) int32 in [0, 2^(c-1)], signs (W,N) bool, ranks (W,N),
        overflow (N) bool, wmaxes (W,) per-window max bucket occupancy).

    Two balance problems with raw unsigned digits: (a) half the bucket
    array is cold once signs exist; (b) the TOP window is skewed by the
    field prime — Pallas p ~ 2^254 means the top byte of a canonical scalar
    is in [0, 64], so its buckets run ~8x hotter than the mean and force
    the shared slot bound far above the per-window need (measured s=2048 vs
    the uniform 512 at N=2^16, c=8 — signed recoding alone does NOT fix
    this, it is a property of the data).

    Fix: recode k + r instead of k (same group element — the commitment
    bases live in the prime-order-r subgroup, so r*G = identity; our
    samplers cofactor-clear, pc/pedersen.py:100-109).  k + r is uniform in
    [r, 2r) ~ [2^254, 2^255.x), which makes EVERY c-bit window uniform.
    The recode's final carry out of bit 255 becomes a per-point `overflow`
    flag whose contribution (2^256 * sum of flagged points) the bucket
    phase folds in as one masked tree-sum + an extended doubling chain.

    Requires c | 256 and r < 2^255 (so k + r < 2^256)."""
    r_mod = curve.fr.modulus
    assert r_mod.bit_length() <= 255
    canon = fp.from_mont(curve.fr, scalars_mont)  # (N, nl) canonical k
    # k + r as 256-bit limbs (r < 2^255 so no 257-bit overflow)
    nl = canon.shape[-1]
    r_limbs = jnp.asarray(fp.int_to_limbs(r_mod, nl))
    v = canon + r_limbs[None, :]
    outs = []
    carry = jnp.zeros(canon.shape[:-1], DTYPE)
    for i in range(nl):
        t = v[..., i] + carry
        carry = t >> LIMB_BITS
        outs.append(t & LIMB_MASK)
    kr = jnp.stack(outs, axis=-1)  # (N, nl) limbs of k + r
    shifts = jnp.arange(LIMB_BITS, dtype=DTYPE)
    bits = ((kr[..., :, None] >> shifts[None, :]) & 1).reshape(
        canon.shape[:-1] + (nl * LIMB_BITS,))[..., :256]

    n = bits.shape[0]
    w = 256 // c
    nb = (1 << (c - 1)) + 1
    half = 1 << (c - 1)
    weights = (jnp.uint32(1) << jnp.arange(c, dtype=jnp.uint32)).astype(jnp.int32)
    digits = jnp.sum(
        bits.reshape(n, w, c).astype(jnp.int32) * weights[None, None, :],
        axis=-1).T  # (W, N) unsigned

    def carry_body(carry, d):
        t = d + carry
        neg = t > half
        out = jnp.where(neg, t - (1 << c), t)
        return neg.astype(jnp.int32), out

    top_carry, sdig = jax.lax.scan(
        carry_body, jnp.zeros((n,), jnp.int32), digits)  # sdig (W, N)
    overflow = top_carry > 0  # (N,) — worth 2^256 * G_i each
    mag = jnp.abs(sdig)
    signs = sdig < 0

    # Rank extraction as MXU matmuls.  rank_i = #{j < i : d_j == d_i} per
    # window.  The former blocked one-hot CUMSUM was log-depth HBM passes
    # (~255 ms of the 2^16 MSM vs a ~33 ms relay floor); an inclusive
    # prefix count is exactly a lower-triangular matmul — tril(1) @ onehot
    # — which the MXU executes in one pass, EXACT in f32 for counts < 2^24
    # (block size <= 512 here).  Digit 0 is excluded (never enters a
    # bucket), so the one-hot spans columns 1..2^(c-1) — a lane-aligned
    # 128-wide tile at c=8.
    ch = 512
    pad = (-n) % ch
    n_pad = n + pad
    nblk = n_pad // ch
    nb1 = nb - 1  # columns for digits 1..half
    tril = jnp.tril(jnp.ones((ch, ch), jnp.float32))

    def per_window(dw):
        dm1 = dw - 1  # digit-minus-1; digit 0 -> -1 (no one-hot column)
        if pad:
            dm1 = jnp.concatenate([dm1, jnp.full((pad,), -1, jnp.int32)])
        onehot = (dm1[:, None]
                  == jnp.arange(nb1, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32).reshape(nblk, ch, nb1)
        incl = jax.lax.dot_general(
            tril, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (ch, nblk, nb1)
        incl = jnp.transpose(incl, (1, 0, 2))         # (nblk, ch, nb1)
        block_tot = incl[:, -1, :]
        offs = jnp.cumsum(block_tot, axis=0) - block_tot  # (nblk, nb1)
        incl = (incl + offs[:, None, :]).reshape(n_pad, nb1)
        rank = jnp.take_along_axis(
            incl[:n], jnp.clip(dw[:, None] - 1, 0, nb1 - 1),
            axis=1)[:, 0].astype(jnp.int32) - 1
        counts = incl[n - 1]
        wmax = jnp.max(counts).astype(jnp.int32)
        return rank, wmax

    # windows in vmapped groups (group size bounds the materialised
    # one-hot at G * N * nb * 4 bytes — ~2 GB at 2^20/c=8)
    g = 4 if w % 4 == 0 else 1
    _, (ranks, wmaxes) = jax.lax.scan(
        lambda _, dg: (None, jax.vmap(per_window)(dg)),
        None, mag.reshape(w // g, g, n))
    # wmaxes is PER-WINDOW (W,) so callers can bound the bulk windows and
    # the structurally-hot top window separately (split sweep, msm())
    return (mag, signs, ranks.reshape(w, n), overflow,
            wmaxes.reshape(w))


@functools.partial(jax.jit, static_argnums=(3, 4))
def _split_hot_window(mag, signs, ranks, s_bulk: int, reps: int):
    """Replicate the hot TOP window into `reps` virtual rows of depth s_bulk.

    The k+r recode makes bulk windows uniform, but the top window's digits
    are concentrated (k + r lies in [r, 2r), so the leading bits mirror r's
    — measured max occupancy ~2x the bulk at 2^16/c=8).  A shared slot
    bound would pay that depth in EVERY window's sweep.  Instead the top
    window becomes `reps` rows: row j holds the entries with rank in
    [j*s_bulk, (j+1)*s_bulk) (rank shifted into [0, s_bulk)); non-selected
    entries get magnitude 0 and are dropped by the slot scatter.  All
    replica rows carry the top window's weight in the window combine
    (dbl_counts).  Sweep work: W*s_top -> (W+reps-1)*s_bulk (~1.9x less).

    Works batched: the window axis is -2, points axis -1."""
    rows_m = [mag[..., :-1, :]]
    rows_s = [signs[..., :-1, :]]
    rows_r = [ranks[..., :-1, :]]
    top_m, top_s, top_r = mag[..., -1:, :], signs[..., -1:, :], ranks[..., -1:, :]
    for j in range(reps):
        sel = (top_r >= j * s_bulk) & (top_r < (j + 1) * s_bulk)
        rows_m.append(jnp.where(sel, top_m, 0))
        rows_s.append(top_s)
        rows_r.append(jnp.where(sel, top_r - j * s_bulk, 0))
    return (jnp.concatenate(rows_m, axis=-2),
            jnp.concatenate(rows_s, axis=-2),
            jnp.concatenate(rows_r, axis=-2))


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 8, 10))
def _bucket_phase(curve: CurveSpec, points: Affine, sorted_digits, perm_ranks,
                  c: int, s: int, unrolls=None, signs=None,
                  signed: bool = False, overflow=None,
                  dbl_counts=None) -> Projective:
    """Builds the slot matrix and returns the full MSM result.

    unrolls: optional (sweep_chunk, agg_unroll, dbl_unroll) static override
    (e.g. the bench's CPU baseline forces the thin variant).
    signed: digits are magnitudes in [0, 2^(c-1)] with per-point `signs`
    (W, N); negative entries add the negated point (y -> -y).
    overflow: optional (N,) bool — points whose k+r recode carried past bit
    255; their sum enters the window combine as an extra 2^256-weighted
    window (one masked log-depth tree-sum).
    dbl_counts: optional static tuple of per-row doubling counts in the
    window combine (for virtual-window rows from _split_hot_window); None
    means row i doubles c*i times (the plain layout)."""
    sweep_chunk, agg_unroll_n, dbl_unroll_n = (
        unrolls if unrolls is not None
        else (SWEEP_CHUNK, AGG_UNROLL_N, DBL_UNROLL_N))
    perm, ranks = perm_ranks
    w = sorted_digits.shape[0]  # window ROWS (= 256/c unless split)
    nb = ((1 << (c - 1)) + 1) if signed else (1 << c)
    n = perm.shape[-1]

    # --- slot matrix: (W, nb, S) of point indices, sentinel = n -------------
    valid = (sorted_digits > 0) & (ranks < s)
    lin_idx = (
        jnp.arange(w)[:, None] * (nb * s)
        + sorted_digits * s
        + jnp.clip(ranks, 0, s - 1)
    )
    lin_idx = jnp.where(valid, lin_idx, w * nb * s)  # drop slot
    scatter_vals = perm.astype(jnp.int32)
    if signed:
        # fold the sign into the table index: negated points live at +n+1
        scatter_vals = scatter_vals + (n + 1) * signs.astype(jnp.int32)
    slot_flat = jnp.full((w * nb * s + 1,), n, dtype=jnp.int32)
    slot_flat = slot_flat.at[lin_idx.reshape(-1)].set(
        scatter_vals.reshape(-1), mode="drop"
    )
    slots = slot_flat[: w * nb * s].reshape(w, nb, s)

    # --- points with infinity sentinel at index n ---------------------------
    nl = points.x.shape[-1]
    px = jnp.concatenate([points.x, jnp.zeros((1, nl), DTYPE)], axis=0)
    py = jnp.concatenate([points.y, jnp.zeros((1, nl), DTYPE)], axis=0)
    pinf = jnp.concatenate([points.inf, jnp.ones((1,), bool)], axis=0)
    if signed:
        py_neg = jnp.concatenate(
            [fp.neg(curve.fq, points.y), jnp.zeros((1, nl), DTYPE)], axis=0)
        px = jnp.concatenate([px, px], axis=0)
        py = jnp.concatenate([py, py_neg], axis=0)
        pinf = jnp.concatenate([pinf, pinf], axis=0)

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
            acc = wst.proj_add_affine(
                curve, acc, Affine(qx[t], qy[t], qinf[t]))
        return acc, None

    init = wst.projective_zero(curve, (w, nb))
    buckets, _ = (jax.lax.scan(body, init, slots_c)
                  if s > 0 else (init, None))

    # --- per-window weighted bucket aggregation: log-depth ------------------
    # sum_{v>=1} v*B_v = sum_{k>=1} S_k where S_k = sum_{v>=k} B_v.  The
    # suffix sums come from one associative scan over the bucket axis
    # (log2(nb) wide steps) and the final sum from a log-depth tree — this
    # replaces the former running/total sequential scan, whose ~2*nb narrow
    # (W-wide) steps were pure launch/loop latency on TPU (~400 ms of the
    # 2^16 MSM; experiments/profile_out.txt).
    bpos = Projective(buckets.x[:, 1:], buckets.y[:, 1:], buckets.z[:, 1:])
    rev = Projective(bpos.x[:, ::-1], bpos.y[:, ::-1], bpos.z[:, ::-1])
    suf = jax.lax.associative_scan(
        lambda p, q: wst.proj_add(curve, p, q), rev, axis=1)
    # sum the nb-1 suffix sums per window: tree reduce over the bucket axis
    m_ax = nb - 1
    pts_agg = suf
    while m_ax > 1:
        half_ax = m_ax // 2
        left = Projective(*(t[:, :half_ax] for t in pts_agg))
        right = Projective(*(t[:, half_ax:2 * half_ax] for t in pts_agg))
        summed = wst.proj_add(curve, left, right)
        if m_ax % 2:
            summed = Projective(*(jnp.concatenate([a, b[:, -1:]], axis=1)
                                for a, b in zip(summed, pts_agg)))
            m_ax = half_ax + 1
        else:
            m_ax = half_ax
        pts_agg = summed
    window_sums = Projective(pts_agg.x[:, 0], pts_agg.y[:, 0], pts_agg.z[:, 0])

    # --- overflow window (k+r recode carry): masked tree-sum ---------------
    # value 2^256 * sum_{overflow_i} G_i; appended as window index W whose
    # doubling count c*W == 256 falls out of the same chain below.
    n_win = w
    if overflow is not None:
        fq_one = jnp.broadcast_to(
            jnp.asarray(curve.fq.one_mont, DTYPE), points.x.shape)
        live = overflow & ~points.inf
        s_pts = Projective(
            jnp.where(live[:, None], points.x, jnp.zeros_like(points.x)),
            jnp.where(live[:, None], points.y, fq_one),
            jnp.where(live[:, None], fq_one, jnp.zeros_like(points.x)))
        s_sum = wst._tree_reduce(curve, s_pts)
        window_sums = Projective(
            jnp.concatenate([window_sums.x, s_sum.x[None]], axis=0),
            jnp.concatenate([window_sums.y, s_sum.y[None]], axis=0),
            jnp.concatenate([window_sums.z, s_sum.z[None]], axis=0))
        n_win = w + 1

    # --- window combine: parallel-weighted, then log-depth tree -------------
    # result = sum_w 2^{c w} S_w.  Doubling chains run batched across all
    # windows at once with per-window masks (window w doubles c*w times),
    # then one tree reduction — O(c*W) doublings of W-wide lanes in
    # ceil(c*W / UNROLL) steps instead of per-window sequential Horner.
    if dbl_counts is None:
        # plain layout: row i doubles c*i times; the overflow row at index
        # w doubles c*w == 256 times (w == 256/c here)
        dbl_per_row = tuple(c * i for i in range(n_win))
    else:
        dbl_per_row = tuple(dbl_counts) + ((256,) if overflow is not None
                                           else ())
        assert len(dbl_per_row) == n_win
    total_dbl = max(dbl_per_row)
    DBL_UNROLL = dbl_unroll_n
    dbl_arr = jnp.asarray(dbl_per_row)

    def dbl_body(acc, i_base):
        for t in range(DBL_UNROLL):
            i = i_base + t
            mask = i < dbl_arr
            doubled = wst.jac_double(curve, acc)
            acc = wst._where_pt(mask, doubled, acc)
        return acc, None

    n_dbl_steps = (total_dbl + DBL_UNROLL - 1) // DBL_UNROLL
    acc, _ = jax.lax.scan(
        dbl_body, window_sums,
        jnp.arange(n_dbl_steps) * DBL_UNROLL)
    return wst._tree_reduce(curve, acc)


def _plan_split(mag, signs, ranks, wm, c: int, n: int):
    """Host-side slot-bound planning: shared bound vs top-window split.

    wm: (W,) numpy per-window max occupancies.  Returns possibly-extended
    (mag, signs, ranks) with the quantized static slot depth s and the
    per-row dbl_counts (None when the plain shared-bound layout wins).
    The decision compares total sweep work (rows * depth) host-side, so
    the split only triggers when the top window is genuinely hot.  Small
    MSMs are launch-latency-bound, not sweep-bound, so they keep the plain
    layout (SPLIT_MIN_N) — this also bounds the number of distinct
    (rows, s) compile variants in the CPU test suite."""
    w = wm.shape[-1]
    s_top = _quantize_slots(int(wm.max()), n)
    if w < 2 or n < SPLIT_MIN_N:
        return mag, signs, ranks, s_top, None
    s_bulk = _quantize_slots(int(wm[..., :-1].max()), n)
    reps = max(-(-int(wm[..., -1].max()) // s_bulk), 1)
    if (w + reps - 1) * s_bulk >= w * s_top:
        return mag, signs, ranks, s_top, None
    mag, signs, ranks = _split_hot_window(mag, signs, ranks, s_bulk, reps)
    dbl_counts = tuple(c * i for i in range(w - 1)) + (c * (w - 1),) * reps
    return mag, signs, ranks, s_bulk, dbl_counts


def msm(curve: CurveSpec, points: Affine, scalars_mont, c: int = None,
        unrolls=None) -> Projective:
    """MSM: sum_i scalars[i] * points[i] -> Projective point.

    points: (N,) Affine, scalars_mont: (N, NLIMBS) Montgomery Fr.
    Small N uses the bit-serial kernel (one jit, no host sync); large N uses
    Pippenger with one host sync for the slot-matrix size.
    unrolls: optional (sweep_chunk, agg_unroll, dbl_unroll) static override
    forwarded to the bucket phase — a reduced-graph fallback when the
    remote compile helper cannot fit the default sweep body (see the
    SWEEP_CHUNK note above).
    """
    n = points.x.shape[0]
    if n == 0:
        return wst.projective_zero(curve, ())
    if n <= SMALL_N_THRESHOLD:
        return wst.msm_bitserial(curve, points, scalars_mont)
    # transparent multi-chip dispatch: when an active mesh is set
    # (parallel/context.py), shard the point axis over it
    from ..parallel import context as par_context
    mesh = par_context.get_mesh()
    if mesh is not None and n % mesh.devices.size == 0 \
            and n // mesh.devices.size > 0 and mesh.devices.size > 1:
        if len(mesh.axis_names) == 2:  # ("dcn", "ici") hierarchical grid
            from ..parallel import multihost
            return multihost.msm_sharded_2d(curve, mesh, points,
                                            scalars_mont, c)
        from ..parallel import sharded
        return sharded.msm_sharded(curve, mesh, points, scalars_mont, c)
    if c is None:
        c = _pick_c(n)
    if 256 % c != 0:
        raise ValueError(f"window size c={c} must divide 256 "
                         "(a non-divisor would silently drop top scalar bits)")
    mag, signs, ranks, overflow, wmaxes = _signed_digits_and_ranks(
        curve, scalars_mont, c
    )
    wm = np.asarray(wmaxes)  # host sync (W small ints, one readback)
    if int(wm.max()) == 0:
        return wst.projective_zero(curve, ())
    if _use_fp8_engine():
        # the experimental f32 engine keeps the plain shared-bound layout
        from . import msm8
        s = _quantize_slots(int(wm.max()), n)
        perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mag.shape)
        return msm8.bucket_phase8(curve, points, mag, (perm, ranks), c, s,
                                  signs=signs, signed=True, overflow=overflow)
    mag, signs, ranks, s, dbl_counts = _plan_split(
        mag, signs, ranks, wm, c, n)
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mag.shape)
    return _bucket_phase(curve, points, mag, (perm, ranks), c, s,
                         unrolls=unrolls, signs=signs, signed=True,
                         overflow=overflow, dbl_counts=dbl_counts)


def msm_batched(curve: CurveSpec, points: Affine, scalars_mont) -> Projective:
    """Batched MSM sharing one point set: scalars (B, N, NLIMBS) -> (B,) Projective.

    Used for committing many equal-length vectors under one Pedersen key
    (e.g. the 2m-2 t-vec commitments, reference src/hp_as/mod.rs:354-388).
    """
    n = points.x.shape[0]
    b = scalars_mont.shape[0]
    if b == 0:
        return wst.projective_zero(curve, (0,))
    if n <= SMALL_N_THRESHOLD:
        return jax.vmap(lambda s: wst.msm_bitserial(curve, points, s))(scalars_mont)
    from ..parallel import context as par_context
    mesh = par_context.get_mesh()
    if mesh is not None and n % mesh.devices.size == 0 \
            and mesh.devices.size > 1:
        if len(mesh.axis_names) == 2:
            from ..parallel import multihost
            msm_1 = lambda s: multihost.msm_sharded_2d(
                curve, mesh, points, s)
        else:
            from ..parallel import sharded
            msm_1 = lambda s: sharded.msm_sharded(
                curve, mesh, points, s)
        outs = [msm_1(scalars_mont[i]) for i in range(b)]
        return Projective(
            jnp.stack([o.x for o in outs]),
            jnp.stack([o.y for o in outs]),
            jnp.stack([o.z for o in outs]))
    c = _pick_c(n)
    mag, signs, ranks, overflow, wmaxes = jax.vmap(
        lambda s: _signed_digits_and_ranks(curve, s, c)
    )(scalars_mont)
    wm = np.asarray(jnp.max(wmaxes, axis=0))  # (W,) shared over the batch
    if int(wm.max()) == 0:
        return wst.projective_zero(curve, (b,))
    if _use_fp8_engine():
        # the experimental f32 engine keeps the plain shared-bound layout
        from . import msm8
        s = _quantize_slots(int(wm.max()), n)
        perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                mag.shape[1:])
        bucket = lambda mg, sg, ra, of: msm8.bucket_phase8(
            curve, points, mg, (perm, ra), c, s, signs=sg, signed=True,
            overflow=of)
        return jax.vmap(bucket)(mag, signs, ranks, overflow)
    mag, signs, ranks, s, dbl_counts = _plan_split(
        mag, signs, ranks, wm, c, n)
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mag.shape[1:])
    bucket = lambda mg, sg, ra, of: _bucket_phase(
        curve, points, mg, (perm, ra), c, s, signs=sg, signed=True,
        overflow=of, dbl_counts=dbl_counts)
    return jax.vmap(bucket)(mag, signs, ranks, overflow)
