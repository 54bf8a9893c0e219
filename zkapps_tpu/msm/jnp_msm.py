"""Pippenger MSM over G1 on TPU — fully batched, scatter-free.

The reference's hottest kernel (halo2_proofs Pippenger, rayon-parallel on CPU;
SURVEY.md §3.5) redesigned for SIMD:

1. **Signed windows**: scalars (standard form, (n,16) 16-bit limbs) are split
   into ceil(256/c) signed base-2^c digits in [-2^(c-1), 2^(c-1)], so only
   2^(c-1) buckets per window and negation is a cheap Y-flip.
2. **Flattened conflict-free bucket accumulation**: ALL windows' buckets live
   in one (W * B) array keyed by w*B + |digit|; one argsort over the W*n
   (window, point) pairs orders them by global bucket, and step k adds every
   bucket's k-th point — a single (W*B)-wide gather + complete point-add per
   step, so each step saturates the chip instead of looping windows.  The
   loop bound is the max bucket occupancy (a traced while_loop bound):
   degenerate/duplicate scalar distributions stay *correct*, merely slower.
3. **Bucket reduction**: sum_b b*S_b = sum_j suffix_j(S) — two Hillis-Steele
   suffix scans with static shifts, batched over all windows at once.
4. **Window combine**: Horner over windows via lax.scan (c doublings + 1 add
   per window); on the Pallas backend these tiny serial ops trace with
   unrolled field graphs (fused kernels) to dodge per-iteration loop launch
   latency.

Everything is jittable end-to-end; the distributed version shards the point
axis and all-reduces partial sums (msm/distributed.py).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp

from ..curve.jnp_point import G1_JNP, JnpG1
from ..fields.jnp_ops import get_backend, get_unroll, set_unroll
from ..fields.limbs import LIMB_BITS, N_LIMBS


def num_windows(c: int) -> int:
    return -(-256 // c)


@contextlib.contextmanager
def _unrolled_if_pallas():
    """Small serial point ops fuse best as unrolled graphs on TPU."""
    old = get_unroll()
    if get_backend() == "pallas":
        set_unroll(True)
    try:
        yield
    finally:
        set_unroll(old)


def signed_digits(scalars: jnp.ndarray, c: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(n, 16) u32 standard-form scalars -> bucket ids + signs.

    Returns (ids, neg): ids (n_windows, n) int32 in [0, 2^(c-1)] (0 = skip),
    neg (n_windows, n) bool; value = sum_w (+-ids_w) * 2^(c*w).
    """
    assert c <= LIMB_BITS
    n_win = num_windows(c)
    half = 1 << (c - 1)
    full = 1 << c
    raw = []
    for w in range(n_win):
        bit0 = w * c
        limb, off = divmod(bit0, LIMB_BITS)
        d = scalars[..., limb] >> off
        if off + c > LIMB_BITS and limb + 1 < N_LIMBS:
            d = d | (scalars[..., limb + 1] << (LIMB_BITS - off))
        raw.append((d & (full - 1)).astype(jnp.int32))
    ids, negs = [], []
    carry = jnp.zeros_like(raw[0])
    for w in range(n_win):
        d = raw[w] + carry
        is_neg = d > half
        carry = is_neg.astype(jnp.int32)
        d = jnp.where(is_neg, d - full, d)
        ids.append(jnp.abs(d))
        negs.append(d < 0)
    return jnp.stack(ids), jnp.stack(negs)


def _suffix_sums(g1: JnpG1, s: jnp.ndarray) -> jnp.ndarray:
    """Inclusive suffix sums over axis 0 (length power of two; extra batch
    dims allowed).

    Hillis-Steele: log2(B) unrolled rounds of x[i] += x[i+2^t] with *static*
    shifts (a traced-shift dynamic_slice version measured ~300x slower on
    TPU); out-of-range reads land in an identity pad, harmless under complete
    addition.
    """
    b = s.shape[0]
    log_b = b.bit_length() - 1
    assert 1 << log_b == b
    x = s
    for t in range(log_b):
        shift = 1 << t
        ident = g1.identity_like((shift,) + s.shape[1:-2])
        shifted = jnp.concatenate([x[shift:], ident], axis=0)
        x = g1.add(x, shifted)
    return x


def _tier_widths(full: int, floor: int = 1 << 14) -> list[int]:
    """Shrinking prefix widths: full, then halving powers of two down to
    ``floor`` (the point where step-loop latency, not width, dominates)."""
    widths = [full]
    w = 1 << (full - 1).bit_length()
    while w >= full:
        w >>= 1
    while w >= floor:
        widths.append(w)
        w >>= 1
    return widths


# addend rows per bucket per kernel step in the sorted scheme (env-tunable
# for pipeline-level A/B runs on real hardware)
SLAB_R = int(os.environ.get("ZKTPU_SLAB_R", "8"))
_BUCKET_SCHEME = "sorted"  # 'sorted' (step-major layout) | 'gather' (per-step row gathers)

# The sorted scheme materializes ~2 step-major copies of 64 B packed rows per
# (window, point) pair plus the 17-operand sort transients — roughly
# 3 * 64 B * W * n of HBM.  Above this pair count (2^26 pairs ~ 12 GiB
# transients, the practical ceiling on a 16 GiB v5e chip) fall back to the
# gather scheme, whose sorted state is one 8 B (gid, rec) record per pair.
SORTED_MAX_PAIRS = 1 << 26


def set_bucket_scheme(name: str) -> None:
    assert name in ("sorted", "gather")
    global _BUCKET_SCHEME
    globals()["_BUCKET_SCHEME"] = name


def _sorted_layout(
    g1: JnpG1,
    points: jnp.ndarray,
    ids: jnp.ndarray,
    negs: jnp.ndarray,
    c: int,
    pad_rows: int,
):
    """Shared prologue of the sorted bucket-accumulation schemes.

    Builds the step-major row layout (two device sorts) plus the bucket
    count tables; returns a dict with rows2, the rank permutation and its
    inverse, and the ``off_of(k)`` / ``m_of(k)`` step-addressing closures.
    See _bucket_accumulate_sorted for the full layout rationale.
    ``pad_rows`` extra zero rows are appended so step slices of any tier
    width up to ``pad_rows`` never clamp.
    """
    n = points.shape[0]
    n_win = ids.shape[0]
    b = (1 << (c - 1)) + 1
    width = n_win * b
    total = n_win * n
    f = g1.f
    h = N_LIMBS // 2

    pts_pk = g1.pack_affine(points[:, :2])
    yw = pts_pk[:, h:]
    y = jnp.concatenate([yw & 0xFFFF, yw >> LIMB_BITS], axis=-1)
    ny = f.sub(jnp.zeros_like(y), y)
    nyw = ny[:, :h] | (ny[:, h:] << LIMB_BITS)
    pts_pk_neg = jnp.concatenate([pts_pk[:, :h], nyw], axis=-1)

    pt_inf = f.is_zero(points[:, 2])
    win_off = jnp.arange(n_win, dtype=jnp.int32)[:, None] * b
    gids = ids + win_off
    gids = jnp.where(pt_inf[None, :], win_off, gids).reshape(-1)
    rows0 = jnp.where(
        negs.reshape(-1)[:, None],
        jnp.tile(pts_pk_neg, (n_win, 1)),
        jnp.tile(pts_pk, (n_win, 1)),
    )

    srt1 = jax.lax.sort((gids,) + tuple(rows0[:, j] for j in range(N_LIMBS)), num_keys=1)
    sorted_gid = srt1[0]

    idx = jnp.arange(total, dtype=jnp.int32)
    brk = sorted_gid[1:] != sorted_gid[:-1]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), brk])
    end_seg = jnp.concatenate([brk, jnp.ones((1,), bool)])
    first = jax.lax.cummax(jnp.where(new_seg, idx, 0))
    last = jax.lax.cummin(jnp.where(end_seg, idx, jnp.int32(2**31 - 1)), reverse=True)
    k_row = idx - first
    cnt_row = last - first + 1
    is_dump_row = (sorted_gid % b) == 0
    cntp = jnp.where(is_dump_row, 0, cnt_row)

    srt2 = jax.lax.sort(
        (k_row, jnp.int32(2**31 - 1) - cntp, sorted_gid) + srt1[1:],
        num_keys=3,
    )
    rows2 = jnp.stack(srt2[3:], axis=1)
    # pad by the widest (padded) tier so step slices [off_k, off_k + w) never
    # clamp (off_k <= total, w <= pad_rows): a clamped dynamic_slice would
    # shift live rows off their rank-aligned lanes
    rows2 = jnp.concatenate([rows2, jnp.zeros((pad_rows, N_LIMBS), jnp.uint32)], axis=0)

    # bucket-level tables (width-sized)
    bucket_range = jnp.arange(width, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_gid, bucket_range)
    end = jnp.searchsorted(sorted_gid, bucket_range, side="right")
    cnt_all = (end - start).astype(jnp.int32)
    is_real = (bucket_range % b) != 0
    count = jnp.where(is_real, cnt_all, 0)
    rank = jnp.argsort(-count)  # stable: ties by gid — matches sort-2 order
    count_r = count[rank]
    cnt_sorted = jnp.sort(cnt_all)
    csum0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_sorted, dtype=jnp.int32)]
    )
    cnt_real_sorted = jnp.sort(count)

    def off_of(k):
        """#pairs in steps < k  ==  sum_b min(cnt_b, k)."""
        j = jnp.searchsorted(cnt_sorted, k)
        return (csum0[j] + k * (width - j)).astype(jnp.int32)

    def m_of(k):
        """#live buckets in step k  ==  #real buckets with count > k."""
        return (width - jnp.searchsorted(cnt_real_sorted, k, side="right")).astype(
            jnp.int32
        )

    inv = jnp.zeros((width,), jnp.int32).at[rank].set(bucket_range)
    return dict(
        rows2=rows2,
        count_r=count_r,
        off_of=off_of,
        m_of=m_of,
        inv=inv,
        width=width,
        n_win=n_win,
        b=b,
    )


def _bucket_accumulate_sorted(
    g1: JnpG1,
    points: jnp.ndarray,
    ids: jnp.ndarray,
    negs: jnp.ndarray,
    c: int,
    xyzz: bool = False,
):
    """Step-major sorted accumulation: ZERO random gathers in the step loop.

    The gather scheme pays ~26 ns of XLA row-gather per (window, point) pair
    — the dominant MSM cost on TPU (the per-row gather is scalar-core issued,
    ~100x off streaming bandwidth).  This scheme moves the point DATA through
    two cheap device sorts instead, so every step reads contiguous slices:

    1. Build (gid, packed-row) pairs with digit signs pre-applied to y
       (broadcast select of a pre-negated copy — no gather).
    2. sort-1 by gid groups each bucket's rows contiguously; streaming scans
       (cummax/cummin) derive each row's within-segment index k and segment
       count.
    3. sort-2 by (k, count desc, gid) produces the STEP-MAJOR layout: all
       step-k rows contiguous, ordered exactly like the occupancy-ranked
       accumulator array — so step k's addend for accumulator lane l is row
       ``off_k + l``, a dynamic_slice, not a gather.  (A bucket at rank l is
       present in step k iff count > k; every higher-ranked bucket has count
       >= count > k, so present buckets always form the prefix [0, m_k) —
       lane == rank is stable across steps.)
    4. The tier loop runs SLAB_R consecutive steps per kernel call
       (fields/pallas_ops.pmadd_slab_pallas) to amortize the accumulator's
       HBM round-trip; off_k / m_k come from O(log W) searchsorteds on
       bucket-count prefix tables.

    Identity points land in the per-window dump bucket (count forced 0), and
    dump rows sort AFTER every live row inside a step (count key 0), so the
    valid mask ``lane < m_k`` alone excludes them.

    With ``xyzz=True`` the accumulators are xyzz coordinates and each step
    runs the 10-mul incomplete mixed add (curve/jnp_point.madd_slab_xyzz)
    instead of the complete RCB15 kernel; returns (buckets, poison_count)
    where poison_count > 0 means some lane hit the P == Q case — which the
    incomplete formula cannot COMPUTE (it is detected and flagged) — and the
    result is NOT trustworthy: callers must re-run with xyzz=False.  With
    xyzz=False returns (buckets, 0).
    """
    r_steps = SLAB_R
    lay = _sorted_layout(g1, points, ids, negs, c, pad_rows=ids.shape[0] * ((1 << (c - 1)) + 1))
    rows2 = lay["rows2"]
    count_r = lay["count_r"]
    off_of, m_of = lay["off_of"], lay["m_of"]
    width, n_win, b = lay["width"], lay["n_win"], lay["b"]

    if xyzz:
        buckets = g1.identity_xyzz_like((width,))
        pflags = jnp.zeros((width,), jnp.uint32)
    else:
        buckets = g1.identity_like((width,))
    widths = _tier_widths(width)
    k_lo = jnp.int32(0)
    for t, w_t in enumerate(widths):
        if t + 1 < len(widths):
            k_hi = count_r[widths[t + 1]]
        else:
            k_hi = count_r[0]  # max occupancy
        lane_t = jnp.arange(w_t, dtype=jnp.int32)

        def slab_of(i, w_t=w_t, k_lo=k_lo, lane_t=lane_t):
            k = k_lo + i * r_steps
            slabs, vm = [], jnp.zeros((w_t,), jnp.uint32)
            for r_i in range(r_steps):
                kk = k + r_i
                slabs.append(jax.lax.dynamic_slice(rows2, (off_of(kk), 0), (w_t, N_LIMBS)))
                vm = vm | ((lane_t < m_of(kk)).astype(jnp.uint32) << r_i)
            return jnp.stack(slabs, axis=1), vm

        n_slabs = jnp.maximum(0, (k_hi - k_lo + r_steps - 1) // r_steps)
        if xyzz:

            def step_x(i, carry, slab_of=slab_of):
                buckets_t, flags_t = carry
                slabs, vm = slab_of(i)
                return g1.madd_slab_xyzz(buckets_t, slabs, vm, flags_t)

            tier, tier_flags = jax.lax.fori_loop(
                0, n_slabs, step_x, (buckets[:w_t], pflags[:w_t])
            )
            pflags = jax.lax.dynamic_update_slice_in_dim(pflags, tier_flags, 0, axis=0)
        else:

            def step(i, buckets_t, slab_of=slab_of):
                slabs, vm = slab_of(i)
                return g1.madd_slab(buckets_t, slabs, vm)

            tier = jax.lax.fori_loop(0, n_slabs, step, buckets[:w_t])
        buckets = jax.lax.dynamic_update_slice_in_dim(buckets, tier, 0, axis=0)
        k_lo = k_lo + n_slabs * r_steps

    inv = lay["inv"]
    if xyzz:
        poison = jnp.sum(pflags)
        buckets = g1.xyzz_to_projective(buckets)[inv]
        return buckets.reshape(n_win, b, 3, N_LIMBS)[:, 1:], poison
    buckets = buckets[inv]
    return buckets.reshape(n_win, b, 3, N_LIMBS)[:, 1:], jnp.uint32(0)


# Tiers at least this wide run the batch-affine kernel; narrower tail tiers
# hand over to the R-chained xyzz slab (per-step batch inversion stops
# paying once step width drops toward launch-latency scale).  Module global
# so tests can force the affine path at small widths.
AFFINE_MIN_WIDTH = 1 << 16


def _bucket_accumulate_sorted_affine(
    g1: JnpG1,
    points: jnp.ndarray,
    ids: jnp.ndarray,
    negs: jnp.ndarray,
    c: int,
):
    """Sorted step-major accumulation with BATCH-AFFINE accumulators.

    Same layout/addressing as _bucket_accumulate_sorted, but wide tiers run
    one batch-affine step per k (prep -> batched inverse -> apply; ~6 muls
    per addend vs the xyzz kernel's 10 — see curve/jnp_point.affine_step),
    and tiers narrower than AFFINE_MIN_WIDTH convert the remaining active
    prefix to xyzz once and finish with the R-chained xyzz slab kernel.
    Returns (buckets (W, B-1, 3, 16), poison_count) with the same poison
    contract as xyzz: nonzero means an equal-point add was detected and the
    caller must re-run with the complete kernel.
    """
    from ..fields.jnp_ops import get_backend

    r_steps = SLAB_R
    b = (1 << (c - 1)) + 1
    n_win = ids.shape[0]
    width = n_win * b
    widths = _tier_widths(width)
    if widths[0] < AFFINE_MIN_WIDTH:
        # too small for the affine scheme to pay — xyzz throughout
        return _bucket_accumulate_sorted(g1, points, ids, negs, c, xyzz=True)

    # pad the tier state once (outside the step loops) to the pallas tile
    if get_backend() == "pallas":
        from ..fields.pallas_ops import AFFINE_TILE

        tile = AFFINE_TILE
    else:
        tile = 1
    wpads = [-(-w // tile) * tile for w in widths]
    lay = _sorted_layout(g1, points, ids, negs, c, pad_rows=wpads[0])
    rows2 = lay["rows2"]
    count_r = lay["count_r"]
    off_of, m_of = lay["off_of"], lay["m_of"]

    ax, ay, occ, pfl = g1.affine_identity_like((wpads[0],))
    k_lo = jnp.int32(0)
    tail_t = len(widths)
    for t, w_t in enumerate(widths):
        if w_t < AFFINE_MIN_WIDTH:
            tail_t = t
            break
        if t + 1 < len(widths):
            k_hi = count_r[widths[t + 1]]
        else:
            k_hi = count_r[0]  # max occupancy
        w_pad = wpads[t]
        lane_t = jnp.arange(w_pad, dtype=jnp.int32)

        def step(i, carry, k_lo=k_lo, w_pad=w_pad, lane_t=lane_t):
            ax_t, ay_t, occ_t, pf_t = carry
            k = k_lo + i
            rows = jax.lax.dynamic_slice(rows2, (off_of(k), 0), (w_pad, N_LIMBS))
            vm = lane_t < m_of(k)
            return g1.affine_step(ax_t, ay_t, occ_t, rows, vm, pf_t)

        n_steps = jnp.maximum(0, k_hi - k_lo)
        ax_t, ay_t, occ_t, pf_t = jax.lax.fori_loop(
            0, n_steps, step, (ax[:w_pad], ay[:w_pad], occ[:w_pad], pfl[:w_pad])
        )
        upd = jax.lax.dynamic_update_slice_in_dim
        ax = upd(ax, ax_t, 0, axis=0)
        ay = upd(ay, ay_t, 0, axis=0)
        occ = upd(occ, occ_t, 0, axis=0)
        pfl = upd(pfl, pf_t, 0, axis=0)
        k_lo = jnp.maximum(k_lo, k_hi)

    if tail_t == len(widths):
        buckets = g1.affine_acc_to_projective(ax[:width], ay[:width], occ[:width])
        poison = jnp.sum(pfl[:width])
    else:
        # xyzz tail: convert the still-active prefix once, then the
        # R-chained slab loop over the remaining (narrow) tiers
        w_tail = widths[tail_t]
        acc_x = g1.affine_acc_to_xyzz(ax[:w_tail], ay[:w_tail], occ[:w_tail])
        pflags_x = pfl[:w_tail]
        for t in range(tail_t, len(widths)):
            w_t = widths[t]
            if t + 1 < len(widths):
                k_hi = count_r[widths[t + 1]]
            else:
                k_hi = count_r[0]
            lane_t = jnp.arange(w_t, dtype=jnp.int32)

            def slab_of(i, w_t=w_t, k_lo=k_lo, lane_t=lane_t):
                k = k_lo + i * r_steps
                slabs, vm = [], jnp.zeros((w_t,), jnp.uint32)
                for r_i in range(r_steps):
                    kk = k + r_i
                    slabs.append(
                        jax.lax.dynamic_slice(rows2, (off_of(kk), 0), (w_t, N_LIMBS))
                    )
                    vm = vm | ((lane_t < m_of(kk)).astype(jnp.uint32) << r_i)
                return jnp.stack(slabs, axis=1), vm

            def step_x(i, carry, slab_of=slab_of):
                acc_t, flags_t = carry
                slabs, vm = slab_of(i)
                return g1.madd_slab_xyzz(acc_t, slabs, vm, flags_t)

            n_slabs = jnp.maximum(0, (k_hi - k_lo + r_steps - 1) // r_steps)
            tier, tier_flags = jax.lax.fori_loop(
                0, n_slabs, step_x, (acc_x[:w_t], pflags_x[:w_t])
            )
            upd = jax.lax.dynamic_update_slice_in_dim
            acc_x = upd(acc_x, tier, 0, axis=0)
            pflags_x = upd(pflags_x, tier_flags, 0, axis=0)
            k_lo = k_lo + n_slabs * r_steps

        tail_proj = g1.xyzz_to_projective(acc_x)
        head_proj = g1.affine_acc_to_projective(
            ax[w_tail:width], ay[w_tail:width], occ[w_tail:width]
        )
        buckets = jnp.concatenate([tail_proj, head_proj], axis=0)
        poison = jnp.sum(pflags_x) + jnp.sum(pfl[w_tail:width])

    buckets = buckets[lay["inv"]]
    return buckets.reshape(n_win, b, 3, N_LIMBS)[:, 1:], poison


def _bucket_accumulate_all(
    g1: JnpG1, points: jnp.ndarray, ids: jnp.ndarray, negs: jnp.ndarray, c: int
) -> jnp.ndarray:
    """All windows at once -> (W, B-1, 3, 16) bucket sums (dump bucket dropped).

    Addends are gathered as *affine* (x, y) rows and folded with the masked
    mixed-add kernel (11 muls vs 14, 33% less gather traffic; the conditional
    negate and valid-select fuse into the kernel).  ``points`` must be
    host-encoded projective with Z in {0, 1} (SRS / caller points are affine).

    The dominating device cost is the per-step random ROW GATHER of addends
    (~33 ns/row on v5e — two orders of magnitude off HBM streaming), so the
    layout minimizes gathered rows:

    * one ``lax.sort`` of (gid, rec) pairs where rec packs point index and
      digit sign — each step then needs ONE scalar gather (rec) + ONE row
      gather (the point), instead of separate order/neg/infinity lookups;
    * **occupancy tiers**: buckets are ranked by descending count and the
      step loop runs on shrinking prefix widths — tier t covers steps
      [count_at_rank(W_t), count_at_rank(W_{t+1})) at width W_t, so total
      gathered rows track the area under the sorted-count curve (~= the
      number of (window, point) pairs) instead of max_occupancy * all
      buckets (~2x fewer at c=16; also absorbs the top-window digit-range
      skew without a special phase).
    """
    n = points.shape[0]
    n_win = ids.shape[0]
    b = (1 << (c - 1)) + 1
    width = n_win * b
    total = n_win * n
    # packed 64 B addend rows: the per-step row gather is the dominant cost
    # (~37 ns/row at 128 B vs ~26 ns at 64 B on v5e), so gather packed
    # and unpack inside the madd kernel
    pts_pk = g1.pack_affine(points[:, :2])
    pt_inf = g1.f.is_zero(points[:, 2])
    win_off = jnp.arange(n_win, dtype=jnp.int32)[:, None] * b
    gids = ids + win_off  # (W, n)
    # infinity points and dump digits both land in the window's dump bucket
    gids = jnp.where(pt_inf[None, :], win_off, gids).reshape(-1)
    pt_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[None], (n_win, n))
    rec = (pt_idx | (negs.astype(jnp.uint32) << 31)).reshape(-1)
    sorted_gid, sorted_rec = jax.lax.sort((gids, rec), num_keys=1)

    bucket_range = jnp.arange(width, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_gid, bucket_range)
    end = jnp.searchsorted(sorted_gid, bucket_range, side="right")
    is_real = (bucket_range % b) != 0
    count = jnp.where(is_real, end - start, 0)

    # occupancy ranking: process heavy buckets first so later (deeper) steps
    # run on narrow prefixes
    rank = jnp.argsort(-count)
    count_r = count[rank]  # descending
    start_r = start[rank]

    def make_step(w_t: int):
        start_t = start_r[:w_t]
        count_t = count_r[:w_t]

        def step(k, buckets_t):
            pos = jnp.clip(start_t + k, 0, total - 1)
            r = sorted_rec[pos]
            j = (r & 0x7FFFFFFF).astype(jnp.int32)
            valid = k < count_t
            return g1.madd_packed(buckets_t, pts_pk[j], (r >> 31) > 0, valid)

        return step

    buckets = g1.identity_like((width,))
    widths = _tier_widths(width)
    k_lo = jnp.int32(0)
    for t, w_t in enumerate(widths):
        # tier t runs while >W_{t+1} buckets can still be active
        if t + 1 < len(widths):
            k_hi = count_r[widths[t + 1]]
        else:
            k_hi = count_r[0]  # max occupancy
        tier = jax.lax.fori_loop(k_lo, k_hi, make_step(w_t), buckets[:w_t])
        buckets = jax.lax.dynamic_update_slice_in_dim(buckets, tier, 0, axis=0)
        k_lo = jnp.maximum(k_lo, k_hi)

    # un-permute rank space -> (window, bucket) space
    inv = jnp.zeros((width,), jnp.int32).at[rank].set(bucket_range)
    buckets = buckets[inv]
    return buckets.reshape(n_win, b, 3, N_LIMBS)[:, 1:]


def _window_combine(g1: JnpG1, window_sums: jnp.ndarray, c: int) -> jnp.ndarray:
    """Horner over windows (MSB first): acc = 2^c * acc + W_w.  -> (3, 16)."""
    with _unrolled_if_pallas():
        acc0 = window_sums[-1]

        def body(acc, w_sum):
            acc = jax.lax.fori_loop(0, c, lambda _, a: g1.double(a), acc)
            return g1.add(acc, w_sum), None

        acc, _ = jax.lax.scan(body, acc0, window_sums[:-1], reverse=True)
        return acc


def default_window_bits(n: int) -> int:
    """Balance accumulation steps (~n/2^(c-1)) against bucket-array width."""
    if n <= (1 << 10):
        return 8
    if n <= (1 << 16):
        return 12
    return 16


def scheme_used(n: int, c: int, scheme: str = "complete") -> str:
    """The bucket kernel msm_buckets_checked will ACTUALLY run for (n, c).

    Returns 'gather' when the gather fallback applies (set_bucket_scheme or
    the SORTED_MAX_PAIRS HBM cap) — in which case a requested 'xyzz'/'affine'
    fast kernel is ignored; benches should check this instead of assuming the
    requested kernel ran."""
    n_pairs = num_windows(c) * n
    if _BUCKET_SCHEME == "sorted" and n_pairs <= SORTED_MAX_PAIRS:
        return scheme
    return "gather"


def msm_buckets_checked(
    points: jnp.ndarray, scalars_std: jnp.ndarray, c: int, scheme: str = "complete"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pippenger phase 1: per-window bucket sums, (W, B-1, 3, 16).

    scheme 'complete' uses the exception-free RCB15 kernel (poison always 0);
    'xyzz' uses the ~27%-cheaper incomplete xyzz kernel and 'affine' the
    batch-affine kernel (~40% cheaper again); both fast kernels return a
    poison count that callers MUST check — nonzero means an equal-point add
    was hit and the result is invalid (re-run with 'complete').  See
    _bucket_accumulate_sorted.  When the gather fallback applies the
    requested fast kernel is NOT used (poison 0) — query ``scheme_used`` to
    detect this."""
    assert scheme in ("complete", "xyzz", "affine")
    g1 = G1_JNP
    ids, negs = signed_digits(scalars_std, c)
    if scheme_used(points.shape[0], c, scheme) != "gather":
        if scheme == "affine":
            return _bucket_accumulate_sorted_affine(g1, points, ids, negs, c)
        return _bucket_accumulate_sorted(g1, points, ids, negs, c, xyzz=scheme == "xyzz")
    # the gather scheme only has the complete kernel
    return _bucket_accumulate_all(g1, points, ids, negs, c), jnp.uint32(0)


def msm_buckets(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """Pippenger phase 1 with the complete kernel (no poison to check)."""
    return msm_buckets_checked(points, scalars_std, c, "complete")[0]


def _tree_sum_points(g1: JnpG1, x: jnp.ndarray) -> jnp.ndarray:
    """Point-add halving tree over axis 0 -> (1, ...)."""
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        rest = x[2 * half :]
        x = g1.add(x[:half], x[half : 2 * half])
        if rest.shape[0]:
            x = jnp.concatenate([x, rest], axis=0)
    return x


def window_sums_of(buckets: jnp.ndarray) -> jnp.ndarray:
    """Pippenger phase 2: sum_b b*S_b per window, work-efficient pair-fold.

    buckets (W, B-1, 3, 16) -> (W, 3, 16), where slot i holds bucket i+1.

    Let f(x) = sum_i (i+1) x_i (= sum of all inclusive suffix sums).  Pairing
    y_i = x_{2i} + x_{2i+1} gives f(x) = 2 f(y) - E(x) with E = sum of
    even-indexed elements, so unrolling all log2(B) levels:

        f = 2^L x_final - sum_l 2^l E_l   (Horner: ((x*2 - E_{L-1})*2 - ...)

    Total work ~2B point adds at VPU-saturating widths — vs 2 B log2(B) for
    the double Hillis-Steele suffix scan this replaces (~15x less at c=16).

    The Horner runs on VECTORS: up-sweep stores each level's (negated) evens
    vector; the down-sweep folds T_l = (-ev_l) + 2*pad(T_{l+1}) elementwise
    (identity-padded to |ev_l|; sums distribute over the pad), seeding
    T_L = x_final so the 2^L weight rides the same chain; ONE final halving
    tree over T_0 yields f.  The naive alternative — a full tree-sum of the
    evens at every level — costs ~L^2/2 extra kernel launches (~105 at
    c=16), which dominated this phase at small widths (launch latency, not
    compute).
    """
    g1 = G1_JNP
    x = jnp.moveaxis(buckets, 0, 1)  # (B-1, W, 3, 16); B-1 = 2^(c-1), pow2
    neg_evens: list[jnp.ndarray] = []
    while x.shape[0] > 1:
        if x.shape[0] % 2:  # high-end identity pad leaves f unchanged
            x = jnp.concatenate([x, g1.identity_like((1,) + x.shape[1:-2])], axis=0)
        ev, od = x[0::2], x[1::2]
        neg_evens.append(g1.neg(ev))
        x = g1.add(ev, od)
    t = x  # (1, W, 3, 16) == x_final, weight 2^L via the doubling chain below
    for nev in reversed(neg_evens):
        t = g1.double(t)
        if t.shape[0] < nev.shape[0]:
            pad = g1.identity_like((nev.shape[0] - t.shape[0],) + t.shape[1:-2])
            t = jnp.concatenate([t, pad], axis=0)
        t = g1.add(nev, t)
    return _tree_sum_points(g1, t)[0]


def msm_core(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """Traceable MSM body (used directly inside shard_map)."""
    window_sums = window_sums_of(msm_buckets(points, scalars_std, c))
    return _window_combine(G1_JNP, window_sums, c)


@functools.partial(jax.jit, static_argnums=(2, 3))
def msm_window_sums_checked(
    points: jnp.ndarray, scalars_std: jnp.ndarray, c: int, scheme: str = "complete"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device phases 1+2: per-window sums (W, 3, 16) + poison count.

    With scheme='xyzz' the result is only valid if poison == 0 (see
    msm_buckets_checked)."""
    buckets, poison = msm_buckets_checked(points, scalars_std, c, scheme)
    return window_sums_of(buckets), poison


def msm_window_sums(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """Device phases 1+2 only: per-window sums (W, 3, 16), complete kernel."""
    return msm_window_sums_checked(points, scalars_std, c, "complete")[0]


def msm_to_host(
    points: jnp.ndarray,
    scalars_std: jnp.ndarray,
    c: int | None = None,
    scheme: str = "xyzz",
):
    """MSM with the final Horner window-combine on the host -> host G1.

    The combine is ~c*W serial doublings on ONE point — pure kernel-launch
    latency on device (~70 ms measured at c=16) vs ~1 ms of host bigint
    arithmetic.  Use whenever the result is leaving the device anyway
    (commitments entering a transcript); keep the device combine inside
    jit-composed / shard_map code.

    Defaults to the fast incomplete-xyzz bucket kernel: the poison count is
    checked on the host (the result crosses to the host anyway) and on the
    cryptographically-unlikely equal-point hit the whole MSM re-runs with the
    complete kernel, so this is exact for ALL inputs.
    """
    from ..curve.host import G1

    if c is None:
        c = default_window_bits(points.shape[0])
    sums_dev, poison = msm_window_sums_checked(points, scalars_std, c, scheme)
    if scheme != "complete" and int(poison) != 0:
        sums_dev, _ = msm_window_sums_checked(points, scalars_std, c, "complete")
    sums = G1_JNP.decode(sums_dev)
    acc = G1.identity()
    for w_sum in reversed(sums):
        for _ in range(c):
            acc = acc.double()
        acc = acc.add(w_sum)
    return acc


@functools.partial(jax.jit, static_argnums=(2, 3))
def msm_many_window_sums_checked(
    points: jnp.ndarray, scalars_stack: jnp.ndarray, c: int, scheme: str = "complete"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k MSMs over SHARED points as ONE bucket accumulation.

    scalars_stack (k, n, 16) standard form; the k polys' windows are
    flattened into one k*W-window pass (the sorted scheme is generic over
    the window count), so a whole commit round costs one sort + one slab
    loop + one reduce instead of k dispatch chains — the batching the
    reference gets from rayon'ing independent commits (SURVEY.md §2.2 X7).
    Returns (sums (k, W, 3, 16), poison).
    """
    k, n, _ = scalars_stack.shape
    g1 = G1_JNP
    ids, negs = signed_digits(scalars_stack, c)  # (W, k, n)
    n_win = ids.shape[0]
    ids = jnp.moveaxis(ids, 1, 0).reshape(k * n_win, n)
    negs = jnp.moveaxis(negs, 1, 0).reshape(k * n_win, n)
    if scheme_used(n * k, c, scheme) != "gather":
        if scheme == "affine":
            buckets, poison = _bucket_accumulate_sorted_affine(g1, points, ids, negs, c)
        else:
            buckets, poison = _bucket_accumulate_sorted(
                g1, points, ids, negs, c, xyzz=scheme == "xyzz"
            )
    else:
        buckets, poison = _bucket_accumulate_all(g1, points, ids, negs, c), jnp.uint32(0)
    sums = window_sums_of(buckets)  # (k*W, 3, 16)
    return sums.reshape(k, n_win, 3, N_LIMBS), poison


def msm_many_to_host(
    points: jnp.ndarray,
    scalars_stack: jnp.ndarray,
    c: int | None = None,
    scheme: str = "xyzz",
) -> list:
    """k MSMs over shared points -> k host G1 results (one device pass).

    Same semantics as k calls of ``msm_to_host`` (poison-checked fast
    kernel, exact complete-kernel fallback, host Horner combine) at the
    dispatch cost of one."""
    from ..curve.host import G1

    k = scalars_stack.shape[0]
    if c is None:
        c = default_window_bits(scalars_stack.shape[1])
    sums_dev, poison = msm_many_window_sums_checked(points, scalars_stack, c, scheme)
    if scheme != "complete" and int(poison) != 0:
        sums_dev, _ = msm_many_window_sums_checked(points, scalars_stack, c, "complete")
    flat = G1_JNP.decode(sums_dev)  # k*W points, poly-major
    n_win = sums_dev.shape[1]
    out = []
    for j in range(k):
        acc = G1.identity()
        for w_sum in reversed(flat[j * n_win : (j + 1) * n_win]):
            for _ in range(c):
                acc = acc.double()
            acc = acc.add(w_sum)
        out.append(acc)
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def msm(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int | None = None) -> jnp.ndarray:
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    points: (n, 3, 16) projective Montgomery; scalars_std: (n, 16) standard
    form (NOT Montgomery).  Returns (3, 16) projective Montgomery.
    """
    if c is None:
        c = default_window_bits(points.shape[0])
    return msm_core(points, scalars_std, c)
