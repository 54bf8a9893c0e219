"""Batched prime-field arithmetic on TPU: (…, 16) uint32 limb vectors.

Design (TPU-first, see SURVEY.md §7): XLA on TPU has no 64-bit integer
multiply, so field elements live as 16 little-endian 16-bit limbs in uint32
lanes, and every op is vectorized over an arbitrary batch prefix.  The unit of
work is never one field element — it is a batch of thousands, which is what
the VPU (8x128 lanes) wants.

Representation
--------------
* Montgomery form with R = 2^256: ``x_mont = x * R mod p``.  All device-side
  values are Montgomery unless suffixed ``_std``.
* Limbs are canonical (< 2^16) and the represented value is < p between ops.

Multiplication: lazy-column Montgomery (SOS-style CIOS hybrid)
--------------------------------------------------------------
Per outer limb ``i`` we accumulate ``a * b_i`` and ``m * p`` into 17 lazy
uint32 columns without carry propagation, then shift one limb.  Overflow
analysis: each iteration adds at most 4 split-halves (< 2^16 each) plus one
shift carry to any column, so after 16 iterations columns are < 16*5*2^16 =
2^22.3 << 2^32.  The Montgomery quotient digit ``m`` only needs the low 16
bits of column 0, which are exact because column 0 never receives carries.
The final value is < 2p (standard CIOS bound), so one conditional subtract
canonicalizes.

This file is pure jnp — it runs identically on CPU (tests) and TPU (prod);
the Pallas fast path lives in ``pallas_ops.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs, ints_to_limbs, limbs_to_ints
from .host import FQ_MODULUS, FR_MODULUS

_MASK = jnp.uint32(LIMB_MASK)
_SHIFT = LIMB_BITS

# Graph-shape mode: 'unrolled' emits straight-line limb arithmetic that XLA
# fuses into one kernel (best runtime on TPU — the lazy-column state never
# leaves registers/VMEM); 'looped' wraps the per-limb iterations in
# lax.fori_loop, shrinking the traced graph ~10x (fast compiles — used by the
# CPU test suite, where XLA:CPU's LLVM pipeline makes big unrolled graphs
# prohibitively slow to build).  Both modes compute identical results.
_UNROLL = True

# Kernel backend: 'jnp' (XLA graphs, portable) or 'pallas' (fused Mosaic
# kernels, TPU only — large batches of mul / point ops run as single kernels
# whose state never leaves VMEM; see fields/pallas_ops.py).
_BACKEND = "jnp"

# Minimum flattened batch for routing a field mul to the Pallas kernel; below
# this the XLA path wins (kernel launch + padding overhead).
PALLAS_MUL_MIN_BATCH = 2048


def set_unroll(flag: bool) -> None:
    global _UNROLL
    _UNROLL = flag


def get_unroll() -> bool:
    return _UNROLL


def set_backend(name: str) -> None:
    assert name in ("jnp", "pallas")
    global _BACKEND
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


class LimbField:
    """Vectorized GF(p) arithmetic over (…, 16) uint32 limb arrays."""

    def __init__(self, p: int, name: str = "F"):
        self.p = p
        self.name = name
        self.n_limbs = N_LIMBS
        # Montgomery constants.
        self.r = (1 << (LIMB_BITS * N_LIMBS)) % p
        self.r2 = (self.r * self.r) % p
        self.r3 = (self.r2 * self.r) % p
        # -p^{-1} mod 2^16
        self.n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # Device constants (closed over by the traced functions).
        self.p_limbs = jnp.asarray(int_to_limbs(p), dtype=jnp.uint32)
        self.r2_limbs = jnp.asarray(int_to_limbs(self.r2), dtype=jnp.uint32)
        self.one_mont = jnp.asarray(int_to_limbs(self.r % p), dtype=jnp.uint32)
        self.zero = jnp.zeros((N_LIMBS,), dtype=jnp.uint32)
        self._n0inv_dev = jnp.uint32(self.n0inv)
        # Cached jitted entry points (mode flags are static cache keys).
        self._mul_jit = jax.jit(self._mul_impl, static_argnums=(2, 3))
        self._add_jit = jax.jit(self._add_impl, static_argnums=(2,))
        self._sub_jit = jax.jit(self._sub_impl, static_argnums=(2,))
        self._pow_jit = jax.jit(self._pow_impl, static_argnums=(1, 2, 3))
        self._batch_inv_jit = jax.jit(self._batch_inv_impl, static_argnums=(1, 2))
        self._redc_cols_jit = jax.jit(self._redc_cols_impl, static_argnums=(1,))

    # ------------------------------------------------------------------
    # host <-> device encoding
    # ------------------------------------------------------------------
    def encode(self, xs, mont: bool = True) -> jnp.ndarray:
        """Host ints -> (len, 16) uint32 limbs (Montgomery by default)."""
        if mont:
            xs = [(x % self.p) * self.r % self.p for x in xs]
        else:
            xs = [x % self.p for x in xs]
        return jnp.asarray(ints_to_limbs(xs), dtype=jnp.uint32)

    def encode_scalar(self, x: int, mont: bool = True) -> jnp.ndarray:
        return self.encode([x], mont=mont)[0]

    def decode(self, arr, mont: bool = True) -> list[int]:
        """(…, 16) limbs -> flat list of canonical ints."""
        vals = limbs_to_ints(np.asarray(arr))
        if mont:
            rinv = pow(self.r, -1, self.p)
            vals = [v * rinv % self.p for v in vals]
        return vals

    def decode_scalar(self, arr, mont: bool = True) -> int:
        return self.decode(np.asarray(arr)[None, :], mont=mont)[0]

    # ------------------------------------------------------------------
    # core ops
    # ------------------------------------------------------------------
    def _cond_sub_p(self, limbs: jnp.ndarray, top: jnp.ndarray, unroll: bool | None = None) -> jnp.ndarray:
        """Subtract p iff value (= limbs + top*2^256) >= p.  Input < 2p."""
        p = self.p_limbs
        if unroll is None:
            unroll = _UNROLL
        if unroll:
            borrow = jnp.zeros_like(limbs[..., 0])
            ds = []
            for j in range(N_LIMBS):
                tj = limbs[..., j]
                pj = p[j] + borrow  # < 2^16 + 1, fits
                ds.append((tj - pj) & _MASK)
                borrow = (tj < pj).astype(jnp.uint32)
            d = jnp.stack(ds, axis=-1)
        else:

            def body(j, state):
                borrow, d = state
                tj = jnp.take(limbs, j, axis=-1)
                pj = jnp.take(p, j) + borrow
                d = jax.lax.dynamic_update_index_in_dim(d, (tj - pj) & _MASK, j, axis=-1)
                return ((tj < pj).astype(jnp.uint32), d)

            borrow, d = jax.lax.fori_loop(
                0, N_LIMBS, body, (jnp.zeros_like(limbs[..., 0]), jnp.zeros_like(limbs))
            )
        ge = (top > 0) | (borrow == 0)
        return jnp.where(ge[..., None], d, limbs)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: a*b*R^{-1} mod p.  Shapes broadcast on batch dims.

        Dispatches through a cached jit keyed on the (unroll, backend) mode
        flags — eager lax control flow re-traces per call, so un-jitted
        looped ops are ~1000x slower than a cache hit."""
        return self._mul_jit(a, b, _UNROLL, _BACKEND)

    def _mul_impl(self, a, b, unroll: bool, backend: str) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        if backend == "pallas":
            batch = 1
            for s in a.shape[:-1]:
                batch *= s
            if batch >= PALLAS_MUL_MIN_BATCH:
                from .pallas_ops import mul_pallas_auto

                return mul_pallas_auto(self, a, b)
        if not unroll:
            return self._mul_looped(a, b)
        t = jnp.zeros(a.shape[:-1] + (N_LIMBS + 1,), dtype=jnp.uint32)
        p = self.p_limbs
        for i in range(N_LIMBS):
            bi = b[..., i : i + 1]
            prod = a * bi  # 16x16-bit products, < 2^32
            t = t.at[..., 0:N_LIMBS].add(prod & _MASK)
            t = t.at[..., 1 : N_LIMBS + 1].add(prod >> _SHIFT)
            m = ((t[..., 0] & _MASK) * self._n0inv_dev) & _MASK
            mp = m[..., None] * p
            t = t.at[..., 0:N_LIMBS].add(mp & _MASK)
            t = t.at[..., 1 : N_LIMBS + 1].add(mp >> _SHIFT)
            carry0 = t[..., 0] >> _SHIFT  # column 0 is ≡ 0 mod 2^16 now
            t = jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1)
            t = t.at[..., 0].add(carry0)
        # Carry-normalize the 17 lazy columns.
        carry = jnp.zeros_like(t[..., 0])
        limbs = []
        for j in range(N_LIMBS):
            s = t[..., j] + carry
            limbs.append(s & _MASK)
            carry = s >> _SHIFT
        top = t[..., N_LIMBS] + carry
        out = jnp.stack(limbs, axis=-1)
        return self._cond_sub_p(out, top, True)

    def _mul_looped(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Same algorithm as mul() with the limb iterations as fori_loops."""
        p = self.p_limbs
        n0 = self._n0inv_dev
        t0 = jnp.zeros(a.shape[:-1] + (N_LIMBS + 1,), dtype=jnp.uint32)

        def body(i, t):
            bi = jnp.take(b, i, axis=-1)[..., None]
            prod = a * bi
            t = t.at[..., 0:N_LIMBS].add(prod & _MASK)
            t = t.at[..., 1 : N_LIMBS + 1].add(prod >> _SHIFT)
            m = ((t[..., 0] & _MASK) * n0) & _MASK
            mp = m[..., None] * p
            t = t.at[..., 0:N_LIMBS].add(mp & _MASK)
            t = t.at[..., 1 : N_LIMBS + 1].add(mp >> _SHIFT)
            carry0 = t[..., 0] >> _SHIFT
            t = jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1)
            return t.at[..., 0].add(carry0)

        t = jax.lax.fori_loop(0, N_LIMBS, body, t0)

        def norm_body(j, state):
            carry, out = state
            s = jnp.take(t, j, axis=-1) + carry
            out = jax.lax.dynamic_update_index_in_dim(out, s & _MASK, j, axis=-1)
            return (s >> _SHIFT, out)

        carry, out = jax.lax.fori_loop(
            0,
            N_LIMBS,
            norm_body,
            (jnp.zeros_like(t[..., 0]), jnp.zeros(a.shape, dtype=jnp.uint32)),
        )
        top = t[..., N_LIMBS] + carry
        return self._cond_sub_p(out, top, False)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def mont_reduce_columns(self, cols: jnp.ndarray) -> jnp.ndarray:
        """Montgomery-reduce 2N_LIMBS lazy product columns -> canonical limbs.

        ``cols`` (…, 32) uint32: column k holds the base-2^16 coefficient of a
        double-width integer X = sum_k cols[k]*2^(16k).  Caller contract:
        cols[k] < 2^30 and X < p*R (REDC then yields < 2p, which the final
        conditional subtract canonicalizes).  For BN254 Fr (p ~ 0.177*R) any
        sum of <= 5 Montgomery products of canonical operands qualifies —
        exactly the T=5 Poseidon MDS row products of the MXU nibble-matmul
        path (hash/poseidon.py).  Returns X*R^{-1} mod p in [0, p): the REDC
        loop of _mul_impl with the a_i*b partial products replaced by the
        precomputed columns.
        """
        return self._redc_cols_jit(cols, _UNROLL)

    def _redc_cols_impl(self, cols, unroll: bool) -> jnp.ndarray:
        p = self.p_limbs
        n0 = self._n0inv_dev
        w = 2 * N_LIMBS + 1
        t0 = jnp.concatenate(
            [cols, jnp.zeros(cols.shape[:-1] + (1,), jnp.uint32)], axis=-1
        )

        def iter_body(t):
            m = ((t[..., 0] & _MASK) * n0) & _MASK
            mp = m[..., None] * p
            t = t.at[..., 0:N_LIMBS].add(mp & _MASK)
            t = t.at[..., 1 : N_LIMBS + 1].add(mp >> _SHIFT)
            carry0 = t[..., 0] >> _SHIFT
            t = jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1)
            return t.at[..., 0].add(carry0)

        if unroll:
            t = t0
            for _ in range(N_LIMBS):
                t = iter_body(t)
            carry = jnp.zeros_like(t[..., 0])
            limbs = []
            for j in range(N_LIMBS):
                s = t[..., j] + carry
                limbs.append(s & _MASK)
                carry = s >> _SHIFT
            out = jnp.stack(limbs, axis=-1)
            top = t[..., N_LIMBS] + carry
            return self._cond_sub_p(out, top, True)

        t = jax.lax.fori_loop(0, N_LIMBS, lambda _, t: iter_body(t), t0)

        def norm_body(j, state):
            carry, out = state
            s = jnp.take(t, j, axis=-1) + carry
            out = jax.lax.dynamic_update_index_in_dim(out, s & _MASK, j, axis=-1)
            return (s >> _SHIFT, out)

        carry, out = jax.lax.fori_loop(
            0,
            N_LIMBS,
            norm_body,
            (jnp.zeros_like(t[..., 0]), jnp.zeros(cols.shape[:-1] + (N_LIMBS,), jnp.uint32)),
        )
        top = t[..., N_LIMBS] + carry
        return self._cond_sub_p(out, top, False)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._add_jit(a, b, _UNROLL)

    def _add_impl(self, a, b, unroll: bool) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        if unroll:
            carry = jnp.zeros_like(a[..., 0])
            limbs = []
            for j in range(N_LIMBS):
                s = a[..., j] + b[..., j] + carry
                limbs.append(s & _MASK)
                carry = s >> _SHIFT
            out = jnp.stack(limbs, axis=-1)
        else:
            s_all = a + b  # limbs < 2^17, carries resolved in the loop

            def body(j, state):
                carry, out = state
                s = jnp.take(s_all, j, axis=-1) + carry
                out = jax.lax.dynamic_update_index_in_dim(out, s & _MASK, j, axis=-1)
                return (s >> _SHIFT, out)

            carry, out = jax.lax.fori_loop(
                0, N_LIMBS, body, (jnp.zeros_like(a[..., 0]), jnp.zeros_like(a))
            )
        return self._cond_sub_p(out, carry, unroll)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._sub_jit(a, b, _UNROLL)

    def _sub_impl(self, a, b, unroll: bool) -> jnp.ndarray:
        a, b = jnp.broadcast_arrays(a, b)
        if unroll:
            borrow = jnp.zeros_like(a[..., 0])
            limbs = []
            for j in range(N_LIMBS):
                bj = b[..., j] + borrow
                limbs.append((a[..., j] - bj) & _MASK)
                borrow = (a[..., j] < bj).astype(jnp.uint32)
            d = jnp.stack(limbs, axis=-1)
            # If we borrowed, add p back.
            carry = jnp.zeros_like(borrow)
            limbs2 = []
            for j in range(N_LIMBS):
                s = d[..., j] + self.p_limbs[j] + carry
                limbs2.append(s & _MASK)
                carry = s >> _SHIFT
            dp = jnp.stack(limbs2, axis=-1)
            return jnp.where((borrow > 0)[..., None], dp, d)

        def body(j, state):
            borrow, d = state
            bj = jnp.take(b, j, axis=-1) + borrow
            aj = jnp.take(a, j, axis=-1)
            d = jax.lax.dynamic_update_index_in_dim(d, (aj - bj) & _MASK, j, axis=-1)
            return ((aj < bj).astype(jnp.uint32), d)

        borrow, d = jax.lax.fori_loop(
            0, N_LIMBS, body, (jnp.zeros_like(a[..., 0]), jnp.zeros_like(a))
        )

        def body2(j, state):
            carry, dp = state
            s = jnp.take(d, j, axis=-1) + jnp.take(self.p_limbs, j) + carry
            dp = jax.lax.dynamic_update_index_in_dim(dp, s & _MASK, j, axis=-1)
            return (s >> _SHIFT, dp)

        _, dp = jax.lax.fori_loop(
            0, N_LIMBS, body2, (jnp.zeros_like(borrow), jnp.zeros_like(a))
        )
        return jnp.where((borrow > 0)[..., None], dp, d)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    # ------------------------------------------------------------------
    # predicates / selection
    # ------------------------------------------------------------------
    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        """(…,) bool — works for both forms (0 is 0 in Montgomery too)."""
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """cond ? a : b, with cond of batch shape (…,)."""
        return jnp.where(cond[..., None], a, b)

    # ------------------------------------------------------------------
    # Montgomery form conversion
    # ------------------------------------------------------------------
    def to_mont(self, a_std: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a_std, self.r2_limbs)

    def from_mont(self, a_mont: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a_mont).at[..., 0].set(1)
        return self.mul(a_mont, one)

    # ------------------------------------------------------------------
    # exponentiation / inversion
    # ------------------------------------------------------------------
    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a *static* Python-int exponent, via scan over bits (MSB first)."""
        return self._pow_jit(a, e, _UNROLL, _BACKEND)

    def _pow_impl(self, a, e: int, unroll: bool, backend: str) -> jnp.ndarray:
        if e == 0:
            return jnp.broadcast_to(self.one_mont, a.shape)
        nbits = e.bit_length()
        bits = jnp.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32)

        one = jnp.broadcast_to(self.one_mont, a.shape)

        def body(res, bit):
            res = self.mul(res, res)
            res = self.mul(res, self.select(jnp.broadcast_to(bit > 0, a.shape[:-1]), a, one))
            return res, None

        res, _ = jax.lax.scan(body, one, bits)
        return res

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inverse a^(p-2).  inv(0) = 0 (useful for batched edge cases)."""
        return self.pow_const(a, self.p - 2)

    def batch_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._batch_inv_jit(a, _UNROLL, _BACKEND)

    def _batch_inv_impl(self, a, unroll: bool, backend: str) -> jnp.ndarray:
        """Montgomery-trick batch inversion along the leading axis.

        Zero entries map to zero.  Cost: 2 associative scans + 1 pow + O(n) muls.
        """
        one = jnp.broadcast_to(self.one_mont, a.shape)
        safe = jnp.where(self.is_zero(a)[..., None], one, a)

        def comb(x, y):
            return self.mul(x, y)

        prefix = jax.lax.associative_scan(comb, safe, axis=0)  # P_i = a_0..a_i
        suffix = jax.lax.associative_scan(comb, safe, axis=0, reverse=True)  # S_i = a_i..a_{n-1}
        total_inv = self.inv(prefix[-1])  # 1/(a_0..a_{n-1})
        n = a.shape[0]
        # inv(a_i) = P_{i-1} * S_{i+1} * total_inv
        p_prev = jnp.concatenate([one[:1], prefix[: n - 1]], axis=0)
        s_next = jnp.concatenate([suffix[1:], one[:1]], axis=0)
        out = self.mul(self.mul(p_prev, s_next), total_inv)
        return jnp.where(self.is_zero(a)[..., None], jnp.zeros_like(a), out)

    # ------------------------------------------------------------------
    # linear combination with static small-int coefficients (for curve ops)
    # ------------------------------------------------------------------
    def mul_small(self, a: jnp.ndarray, k: int) -> jnp.ndarray:
        """a * k for small static k >= 0 via doubling chain (k <= ~32)."""
        assert 0 <= k
        if k == 0:
            return jnp.zeros_like(a)
        result = None
        addend = a
        while k:
            if k & 1:
                result = addend if result is None else self.add(result, addend)
            k >>= 1
            if k:
                addend = self.add(addend, addend)
        return result


@functools.cache
def get_field(p: int, name: str = "F") -> LimbField:
    return LimbField(p, name)


# Canonical instances.
FQ = get_field(FQ_MODULUS, "Fq")
FR = get_field(FR_MODULUS, "Fr")
