"""Pippenger MSM over G1 on TPU — fully batched, scatter-free.

The reference's hottest kernel (halo2_proofs Pippenger, rayon-parallel on CPU;
SURVEY.md §3.5) redesigned for SIMD:

1. **Signed windows**: scalars (standard form, (n,16) 16-bit limbs) are split
   into ceil(256/c) signed base-2^c digits in [-2^(c-1), 2^(c-1)], so only
   2^(c-1) buckets per window and negation is a cheap Y-flip.
2. **Conflict-free bucket accumulation**: per window, argsort point indices by
   bucket id; at step k every bucket consumes its k-th point (positions
   start[b]+k in sorted order) — one (B,)-wide gather + one complete point-add
   per step, no scatters, no data-dependent shapes.  The loop bound is the max
   bucket occupancy (a traced while_loop bound), so adversarial/duplicate
   scalar distributions stay *correct*, merely slower — no silent overflow.
3. **Bucket reduction**: sum_b b*S_b = sum_j suffix_j(S) — two Hillis-Steele
   suffix scans (log2(B) rounds of one full-width complete add each, shifted
   via dynamic_slice into an identity-padded buffer; adding the identity is a
   no-op under complete formulas, so no masking is needed).
4. **Window combine**: Horner over windows via lax.scan (c doublings + 1 add
   per window).

Graph-size note: every stage is expressed as lax.scan/fori_loop over a single
point-op body, keeping the traced graph to a handful of field-mul
instantiations — compile time stays flat in n and c.

Everything is jittable end-to-end; the distributed version shards the point
axis and psum-combines per-window bucket sums (msm/distributed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curve.jnp_point import G1_JNP, JnpG1
from ..fields.limbs import LIMB_BITS, N_LIMBS


def num_windows(c: int) -> int:
    return -(-256 // c)


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
    """Inclusive suffix sums over axis 0 (length power of two).

    Hillis-Steele: log2(B) rounds of x[i] += x[i+2^t], out-of-range reads
    land in an identity pad (harmless under complete addition).
    """
    b = s.shape[0]
    log_b = b.bit_length() - 1
    assert 1 << log_b == b
    ident = g1.identity_like((b,))
    shifts = jnp.asarray([1 << t for t in range(log_b)], dtype=jnp.int32)

    def body(x, shift):
        xp = jnp.concatenate([x, ident], axis=0)
        shifted = jax.lax.dynamic_slice_in_dim(xp, shift, b, axis=0)
        return g1.add(x, shifted), None

    x, _ = jax.lax.scan(body, s, shifts)
    return x


def _window_fn(
    g1: JnpG1, points: jnp.ndarray, ids: jnp.ndarray, neg: jnp.ndarray, c: int
) -> jnp.ndarray:
    """One window: bucket-accumulate + weighted reduce.  -> (3, 16)."""
    n = points.shape[0]
    n_buckets = (1 << (c - 1)) + 1
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    bucket_range = jnp.arange(n_buckets, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_ids, bucket_range)
    end = jnp.searchsorted(sorted_ids, bucket_range, side="right")
    count = end - start
    max_count = jnp.max(jnp.where(bucket_range > 0, count, 0))

    buckets0 = g1.identity_like((n_buckets,))

    def body(k, buckets):
        pos = jnp.clip(start + k, 0, n - 1)
        pidx = order[pos]
        pts = g1.cneg(neg[pidx], points[pidx])
        valid = (k < count) & (bucket_range > 0)
        return g1.select(valid, g1.add(buckets, pts), buckets)

    buckets = jax.lax.fori_loop(0, max_count, body, buckets0)
    # sum_b b*S_b  =  sum_j suffix_j  where suffix_j = sum_{k>=j} S_{k+1}.
    suffix = _suffix_sums(g1, buckets[1:])
    return _suffix_sums(g1, suffix)[0]


def _window_combine(g1: JnpG1, window_sums: jnp.ndarray, c: int) -> jnp.ndarray:
    """Horner over windows (MSB first): acc = 2^c * acc + W_w.  -> (3, 16)."""
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


@functools.partial(jax.jit, static_argnums=(2,))
def msm(points: jnp.ndarray, scalars_std: jnp.ndarray, c: int | None = None) -> jnp.ndarray:
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    points: (n, 3, 16) projective Montgomery; scalars_std: (n, 16) standard
    form (NOT Montgomery).  Returns (3, 16) projective Montgomery.
    """
    g1 = G1_JNP
    n = points.shape[0]
    if c is None:
        c = default_window_bits(n)
    ids, negs = signed_digits(scalars_std, c)

    def per_window(_, id_neg):
        win_ids, win_negs = id_neg
        return None, _window_fn(g1, points, win_ids, win_negs, c)

    _, window_sums = jax.lax.scan(per_window, None, (ids, negs))
    return _window_combine(g1, window_sums, c)
