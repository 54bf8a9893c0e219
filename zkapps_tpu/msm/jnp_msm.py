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


def _bucket_accumulate_all(
    g1: JnpG1, points: jnp.ndarray, ids: jnp.ndarray, negs: jnp.ndarray, c: int
) -> jnp.ndarray:
    """All windows at once -> (W, B-1, 3, 16) bucket sums (dump bucket dropped).

    Addends are gathered as *affine* (x, y) rows and folded with the masked
    mixed-add kernel (11 muls vs 14, 33% less gather traffic; the conditional
    negate and valid-select fuse into the kernel).  ``points`` must be
    host-encoded projective with Z in {0, 1} (SRS / caller points are affine).

    Skew fix: the top window's digit range is ~p >> (256-c) — far fewer
    distinct buckets than 2^(c-1), so its max occupancy is ~3x the others and
    a single loop bound would idle every other window for the tail.  Phase 1
    runs all windows to the non-top max; phase 2 continues the top window
    alone on a 1/W-width slice.
    """
    n = points.shape[0]
    n_win = ids.shape[0]
    b = (1 << (c - 1)) + 1
    pts_xy = points[:, :2]
    pt_inf = g1.f.is_zero(points[:, 2])
    win_off = jnp.arange(n_win, dtype=jnp.int32)[:, None] * b
    gids = (ids + win_off).reshape(-1)  # (W*n,)
    negs_flat = negs.reshape(-1)
    order = jnp.argsort(gids)
    sorted_ids = gids[order]
    bucket_range = jnp.arange(n_win * b, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_ids, bucket_range)
    end = jnp.searchsorted(sorted_ids, bucket_range, side="right")
    count = end - start
    is_real = (bucket_range % b) != 0
    real_count = jnp.where(is_real, count, 0)
    max_main = jnp.max(real_count[: (n_win - 1) * b]) if n_win > 1 else jnp.int32(0)
    max_top = jnp.max(real_count[(n_win - 1) * b :])
    total = n_win * n

    def step(k, buckets, start_v, count_v, real_v):
        pos = jnp.clip(start_v + k, 0, total - 1)
        j = order[pos]
        valid = (k < count_v) & real_v & ~pt_inf[j % n]
        return g1.madd(buckets, pts_xy[j % n], negs_flat[j], valid)

    buckets0 = g1.identity_like((n_win * b,))
    buckets = jax.lax.fori_loop(
        0,
        max_main,
        lambda k, bk: step(k, bk, start, count, is_real),
        buckets0,
    )
    # phase 2: top window only (zero trips when max_top <= max_main)
    lo = (n_win - 1) * b
    top = jax.lax.fori_loop(
        max_main,
        max_top,
        lambda k, bk: step(k, bk, start[lo:], count[lo:], is_real[lo:]),
        buckets[lo:],
    )
    buckets = jnp.concatenate([buckets[:lo], top], axis=0)
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


def msm_buckets(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """Pippenger phase 1: per-window bucket sums, (W, B-1, 3, 16)."""
    g1 = G1_JNP
    ids, negs = signed_digits(scalars_std, c)
    return _bucket_accumulate_all(g1, points, ids, negs, c)


def window_sums_of(buckets: jnp.ndarray) -> jnp.ndarray:
    """Pippenger phase 2: sum_b b*S_b per window via double suffix scan.

    buckets (W, B-1, 3, 16) -> (W, 3, 16)."""
    g1 = G1_JNP
    arr = jnp.moveaxis(buckets, 0, 1)  # (B-1, W, 3, 16)
    suffix = _suffix_sums(g1, arr)
    return _suffix_sums(g1, suffix)[0]


def msm_core(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """Traceable MSM body (used directly inside shard_map)."""
    window_sums = window_sums_of(msm_buckets(points, scalars_std, c))
    return _window_combine(G1_JNP, window_sums, c)


@functools.partial(jax.jit, static_argnums=(2,))
def msm(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int | None = None) -> jnp.ndarray:
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    points: (n, 3, 16) projective Montgomery; scalars_std: (n, 16) standard
    form (NOT Montgomery).  Returns (3, 16) projective Montgomery.
    """
    if c is None:
        c = default_window_bits(points.shape[0])
    return msm_core(points, scalars_std, c)
