"""Pallas TPU kernels for the field/curve hot path.

The jnp limb kernels leave a trade-off: unrolled graphs fuse well but compile
slowly through XLA, and looped graphs round-trip state through HBM; both pay
per-HLO dispatch overhead that dominates point ops built from ~30 field-op
calls.  These Mosaic kernels fuse a whole field multiply — and a whole
complete point addition (12 muls + ~30 add/subs) — into ONE kernel whose
intermediate state never leaves VMEM/registers.

Internal layout: blocks arrive library-standard (tile, …, 16) limb-minor and
are transposed in VMEM to limb-major (16, tile) so the batch rides the
128-wide lane axis; limbs live on sublanes and all carry/propagate steps are
full-width (16, T) ops with Kogge-Stone carry lookahead (log2(16)=4 rounds)
instead of serial 16-step chains.

Kernels must not capture traced constants: p/n0inv are Python ints baked at
trace time; the (16,1) p column is a kernel input.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs

MASK = LIMB_MASK  # python int — do not capture traced constants in kernels
DEFAULT_TILE = 1024

# Interpret mode: run the kernels as de-sugared jax ops (any backend) — used
# by the CPU test suite to parity-check kernel logic without a TPU.  Static
# jit arg, so both modes can coexist in one process.
_INTERPRET = False


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


# ---------------------------------------------------------------------------
# full-width (16, T) limb helpers (used INSIDE kernels)
# ---------------------------------------------------------------------------


def _shift_up(x, k):
    """Shift rows toward higher limb indices by k (zeros shifted in)."""
    return jnp.concatenate([jnp.zeros_like(x[:k]), x[: N_LIMBS - k]], axis=0)


def _resolve_carries(s):
    """Exact carry resolution for (16,T) columns with values < 2^17.

    Kogge-Stone over (generate, propagate): 4 rounds of full-width ops.
    Returns (limbs (16,T) canonical, carry_out (1,T))."""
    g = s >> LIMB_BITS  # 0/1
    p = ((s & MASK) == MASK).astype(jnp.uint32)
    gp, pp = g, p
    for k in (1, 2, 4, 8):
        g_sh = _shift_up(gp, k)
        p_sh = _shift_up(pp, k)
        gp = gp | (pp & g_sh)
        pp = pp & p_sh
    carry_in = _shift_up(gp, 1)  # carry into limb j = G[j-1]
    out = (s + carry_in) & MASK
    carry_out = gp[N_LIMBS - 1 : N_LIMBS]
    return out, carry_out


def _fw_add_raw(a, b):
    """a + b as canonical limbs + carry_out; inputs canonical (16,T)."""
    return _resolve_carries(a + b)


def _fw_sub_mod2(a, b, extra: int = 0):
    """(a - b + extra) mod 2^256 via complement add; returns (limbs, no_borrow).

    no_borrow (1,T) is 1 iff a + extra >= b.  extra in {0,1}."""
    comp = (MASK - b) + a  # each < 2^17
    if extra:
        comp = jnp.concatenate([comp[0:1] + extra, comp[1:]], axis=0)
    # add the +1 of two's complement
    comp = jnp.concatenate([comp[0:1] + 1, comp[1:]], axis=0)
    out, carry = _resolve_carries(comp)
    return out, carry


def _fw_cond_sub_p(limbs, top, p_arr):
    """Subtract p iff (limbs + top*2^256) >= p; inputs < 2p."""
    d, no_borrow = _fw_sub_mod2(limbs, p_arr)
    ge = (top > 0) | (no_borrow > 0)
    return jnp.where(ge, d, limbs)


def _fw_add(a, b, p_arr):
    s, carry = _fw_add_raw(a, b)
    return _fw_cond_sub_p(s, carry, p_arr)


def _fw_sub(a, b, p_arr):
    d, no_borrow = _fw_sub_mod2(a, b)
    dp, _ = _fw_add_raw(d, p_arr)
    return jnp.where(no_borrow > 0, d, dp)


def _fw_mul_small(a, k: int, p_arr):
    """a * k for tiny static k via double-and-add (k <= ~16)."""
    result = None
    addend = a
    while k:
        if k & 1:
            result = addend if result is None else _fw_add(result, addend, p_arr)
        k >>= 1
        if k:
            addend = _fw_add(addend, addend, p_arr)
    return result


def _mont_mul_columns(a, b, p_arr, n0inv: int):
    """The shared lazy-column CIOS loop of the strict and lazy Montgomery
    multipliers: 16 interleaved product/reduction iterations, returning the
    raw column state t (each column < 2^22) and a zero row for the caller's
    epilogue.  The carry invariants live HERE, once — only the epilogues
    (strict: track the 2^256 top + conditional subtract; lazy: drop both)
    differ between _fw_mont_mul and _fw_mont_mul_lazy.

    The column state stays a sublane-ALIGNED (16,T) tensor plus a (1,T) top
    column: Mosaic tiles (17,T) u32 as 3x(8,128) sublane tiles per lane
    group, so every add/mask op on the ragged layout costs 3 tiles instead
    of 2 — keeping the hot loop at (16,T) cuts ~1/3 of the vector work.

    Per iteration, column 16 only ever receives the two hi-halves
    prod_hi[15] + mp_hi[15] (< 2^17) and is immediately consumed by the
    end-of-iteration down-shift (it becomes row 15), so it is tracked as a
    local (1,T) row rather than a 17th sublane row.
    """
    t = jnp.zeros((N_LIMBS, a.shape[1]), jnp.uint32)
    zrow = jnp.zeros_like(a[0:1])
    for i in range(N_LIMBS):
        bi = b[i : i + 1]
        prod = a * bi
        plo = prod & MASK
        phi = prod >> LIMB_BITS
        # column 0 never receives carries, so t[0]'s low 16 bits are exact
        m = (((t[0:1] + plo[0:1]) & MASK) * n0inv) & MASK
        mp = p_arr * m
        mlo = mp & MASK
        mhi = mp >> LIMB_BITS
        t = t + plo + mlo
        hi_sum = phi + mhi  # < 2^17 per row
        t = t + jnp.concatenate([zrow, hi_sum[: N_LIMBS - 1]], axis=0)
        carry0 = t[0:1] >> LIMB_BITS
        t = jnp.concatenate([t[1:2] + carry0, t[2:], hi_sum[N_LIMBS - 1 :]], axis=0)
    return t, zrow


def _fw_mont_mul(a, b, p_arr, n0inv: int):
    """Strict Montgomery product, (16,T) x (16,T) -> (16,T) canonical < p.

    Same algorithm/bounds as jnp_ops.LimbField.mul (see _mont_mul_columns
    for the shared loop and its layout rationale)."""
    t, zrow = _mont_mul_columns(a, b, p_arr, n0inv)
    # lazy columns < 2^22: two relax passes bring them under 2^17, then KS;
    # the relax overflow out of row 15 accumulates in a (1,T) top column.
    top = zrow
    for _ in range(2):
        lo = t & MASK
        hi = t >> LIMB_BITS
        t = lo + jnp.concatenate([zrow, hi[: N_LIMBS - 1]], axis=0)
        top = top + hi[N_LIMBS - 1 :]
    limbs, carry_out = _resolve_carries(t)
    top = top + carry_out
    return _fw_cond_sub_p(limbs, top, p_arr)


# ---------------------------------------------------------------------------
# complete point addition / doubling (RCB15, a=0, b3=9) on (3,16,T)
# ---------------------------------------------------------------------------

B3 = 9


def _fw_point_add(P, Q, p_arr, n0inv):
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    mul = lambda a, b: _fw_mont_mul(a, b, p_arr, n0inv)  # noqa: E731
    add = lambda a, b: _fw_add(a, b, p_arr)  # noqa: E731
    sub = lambda a, b: _fw_sub(a, b, p_arr)  # noqa: E731

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    ty = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    three_t0 = _fw_mul_small(t0, 3, p_arr)
    b3_t2 = _fw_mul_small(t2, B3, p_arr)
    z3t = add(t1, b3_t2)
    t1m = sub(t1, b3_t2)
    y3t = _fw_mul_small(ty, B3, p_arr)
    X3 = sub(mul(t3, t1m), mul(t4, y3t))
    Y3 = add(mul(y3t, three_t0), mul(t1m, z3t))
    Z3 = add(mul(z3t, t4), mul(three_t0, t3))
    return X3, Y3, Z3


def _fw_point_madd(P, Qxy, flags, p_arr, n0inv):
    """Complete mixed addition P(projective) + Q(affine), masked.

    Derived from RCB15 Algorithm 7 by substituting Z2 = 1 (11 muls vs 14;
    complete in P for any non-infinity Q).  flags (1,T) bit0 = negate Q,
    bit1 = skip (Q is identity or slot invalid) -> result = P.
    """
    X1, Y1, Z1 = P
    x2, y2 = Qxy
    mul = lambda a, b: _fw_mont_mul(a, b, p_arr, n0inv)  # noqa: E731
    add = lambda a, b: _fw_add(a, b, p_arr)  # noqa: E731
    sub = lambda a, b: _fw_sub(a, b, p_arr)  # noqa: E731

    neg = (flags & 1) > 0
    skip = (flags & 2) > 0
    y2 = jnp.where(neg, _fw_sub(jnp.zeros_like(y2), y2, p_arr), y2)

    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = sub(mul(add(X1, Y1), add(x2, y2)), add(t0, t1))  # X1 y2 + x2 Y1
    t4 = add(mul(y2, Z1), Y1)  # Y1 Z2 + Y2 Z1 with Z2 = 1
    ty = add(mul(x2, Z1), X1)  # X1 Z2 + X2 Z1 with Z2 = 1
    three_t0 = _fw_mul_small(t0, 3, p_arr)
    b3_t2 = _fw_mul_small(Z1, B3, p_arr)  # t2 = Z1 Z2 = Z1
    z3t = add(t1, b3_t2)
    t1m = sub(t1, b3_t2)
    y3t = _fw_mul_small(ty, B3, p_arr)
    X3 = sub(mul(t3, t1m), mul(t4, y3t))
    Y3 = add(mul(y3t, three_t0), mul(t1m, z3t))
    Z3 = add(mul(z3t, t4), mul(three_t0, t3))
    X3 = jnp.where(skip, X1, X3)
    Y3 = jnp.where(skip, Y1, Y3)
    Z3 = jnp.where(skip, Z1, Z3)
    return X3, Y3, Z3


def _fw_point_madd_skip(P, Qxy, skip, p_arr, n0inv):
    """Complete mixed addition P + Q with a skip mask only (no negate).

    Same as _fw_point_madd with the sign select removed — the MSM slab path
    pre-applies digit signs to the materialized addend rows, so the kernel
    only needs the valid mask.
    """
    X1, Y1, Z1 = P
    x2, y2 = Qxy
    mul = lambda a, b: _fw_mont_mul(a, b, p_arr, n0inv)  # noqa: E731
    add = lambda a, b: _fw_add(a, b, p_arr)  # noqa: E731
    sub = lambda a, b: _fw_sub(a, b, p_arr)  # noqa: E731

    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = sub(mul(add(X1, Y1), add(x2, y2)), add(t0, t1))  # X1 y2 + x2 Y1
    t4 = add(mul(y2, Z1), Y1)  # Y1 Z2 + Y2 Z1 with Z2 = 1
    ty = add(mul(x2, Z1), X1)  # X1 Z2 + X2 Z1 with Z2 = 1
    three_t0 = _fw_mul_small(t0, 3, p_arr)
    b3_t2 = _fw_mul_small(Z1, B3, p_arr)  # t2 = Z1 Z2 = Z1
    z3t = add(t1, b3_t2)
    t1m = sub(t1, b3_t2)
    y3t = _fw_mul_small(ty, B3, p_arr)
    X3 = sub(mul(t3, t1m), mul(t4, y3t))
    Y3 = add(mul(y3t, three_t0), mul(t1m, z3t))
    Z3 = add(mul(z3t, t4), mul(three_t0, t3))
    X3 = jnp.where(skip, X1, X3)
    Y3 = jnp.where(skip, Y1, Y3)
    Z3 = jnp.where(skip, Z1, Z3)
    return X3, Y3, Z3


def _fw_is_zero(x):
    """Canonical (16,T) limbs -> (1,T) bool: value == 0."""
    return (x == 0).all(axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# lazy [0, 2p) domain ops — the xyzz kernel's hot path
#
# BN254's p is ~2^254.4, so 4p < 2^256: field values can live in [0, 2p)
# between operations.  Montgomery mul is CLOSED over this domain with NO
# final conditional subtraction — for a, b < 2p the reduced accumulator is
# (ab + mp)/2^256 < p*(4p/2^256 + 1) < 1.76p — which deletes ~22 of ~250
# vector ops per multiply.  Adds/subs reduce against 2p instead of p (same
# cost as the strict forms), and zero-tests must accept both residue
# representations {0, p}.
# ---------------------------------------------------------------------------


def _fw_mont_mul_lazy(a, b, p_arr, n0inv):
    """Montgomery product over the lazy domain: a, b < 2p -> result < 2p.

    Same lazy-column loop as _fw_mont_mul (_mont_mul_columns) but the
    epilogue drops the conditional subtract and the 2^256 top column (the
    value is < 1.76p < 2^256, so the top is mathematically zero)."""
    t, zrow = _mont_mul_columns(a, b, p_arr, n0inv)
    for _ in range(2):
        lo = t & MASK
        hi = t >> LIMB_BITS
        t = lo + jnp.concatenate([zrow, hi[: N_LIMBS - 1]], axis=0)
    limbs, _ = _resolve_carries(t)
    return limbs


def _fw_cond_sub_2p(limbs, p2_arr):
    """Subtract 2p iff limbs >= 2p; input < 4p (< 2^256), result < 2p."""
    d, no_borrow = _fw_sub_mod2(limbs, p2_arr)
    return jnp.where(no_borrow > 0, d, limbs)


def _fw_add_2p(a, b, p2_arr):
    """a + b over [0, 2p): sum < 4p < 2^256, one reduction vs 2p."""
    limbs, _ = _resolve_carries(a + b)
    return _fw_cond_sub_2p(limbs, p2_arr)


def _fw_sub_2p(a, b, p2_arr):
    """a - b over [0, 2p): a - b + 2p in (0, 4p), computed mod 2^256 via
    complement add (one relax pass tames the 18-bit columns), then one
    reduction vs 2p."""
    s = a + (MASK - b) + p2_arr  # columns < 3 * 2^16
    s = jnp.concatenate([s[0:1] + 1, s[1:]], axis=0)  # +1 of two's complement
    lo = s & MASK
    hi = s >> LIMB_BITS  # 0..2
    # mod 2^256: the carry out of limb 15 is dropped (true value < 4p < 2^256)
    t = lo + jnp.concatenate([jnp.zeros_like(hi[0:1]), hi[: N_LIMBS - 1]], axis=0)
    limbs, _ = _resolve_carries(t)
    return _fw_cond_sub_2p(limbs, p2_arr)


def _fw_is_zero_2p(x, p_arr):
    """Residue-zero test over [0, 2p): limbs == 0 or limbs == p."""
    return ((x == 0).all(axis=0, keepdims=True)) | (
        (x == p_arr).all(axis=0, keepdims=True)
    )


def _fw_point_madd_xyzz(P4, Qxy, valid, p_arr, p2_arr, n0inv, one_col):
    """Mixed addition in xyzz coordinates (X, Y, ZZ, ZZZ): 10 muls, ~7 adds.

    madd-2008-s with Z2 = 1 (x = X/ZZ, y = Y/ZZZ, ZZ^3 == ZZZ^2); ~30% fewer
    vector ops than the complete RCB15 mixed add (11 muls + ~25 modular
    add/subs), which is what the MSM slab loop spends its time on.  All
    arithmetic runs over the lazy [0, 2p) domain (_fw_mont_mul_lazy et al. —
    no per-mul canonicalization); coordinates stay < 2p across chained calls
    and are canonicalized by the strict muls of the final xyzz->projective
    conversion outside the kernel.  NOT complete: the P == Q (doubling) case
    is *detected* and reported as a poison flag instead of computed — the
    caller keeps the accumulator unchanged for poisoned lanes and re-runs
    with the complete kernel if any poison fired (cryptographically
    negligible for distinct input points).  Exact cases handled branchlessly:
    fresh accumulator (ZZ1 == 0 -> Q), cancellation P == -Q (-> identity),
    masked lanes (-> P).

    P4: (X1, Y1, ZZ1, ZZZ1) each (16,T) in [0, 2p); Qxy affine (x2, y2)
    canonical; valid (1,T) bool; one_col (16,1) Montgomery 1.  Returns
    ((X,Y,ZZ,ZZZ), poison(1,T)).
    """
    X1, Y1, ZZ1, ZZZ1 = P4
    x2, y2 = Qxy
    mul = lambda a, b: _fw_mont_mul_lazy(a, b, p_arr, n0inv)  # noqa: E731
    add = lambda a, b: _fw_add_2p(a, b, p2_arr)  # noqa: E731
    sub = lambda a, b: _fw_sub_2p(a, b, p2_arr)  # noqa: E731

    # ZZ1 is exactly zero only by assignment (identity lanes), never as the
    # residue representation p — a plain all-zero test suffices.
    inf1 = _fw_is_zero(ZZ1)
    U2 = mul(x2, ZZ1)
    S2 = mul(y2, ZZZ1)
    Pd = sub(U2, X1)
    Rr = sub(S2, Y1)
    pz = _fw_is_zero_2p(Pd, p_arr)
    rz = _fw_is_zero_2p(Rr, p_arr)
    PP = mul(Pd, Pd)
    PPP = mul(Pd, PP)
    Q = mul(X1, PP)
    R2 = mul(Rr, Rr)
    X3 = sub(sub(R2, PPP), add(Q, Q))
    Y3 = sub(mul(Rr, sub(Q, X3)), mul(Y1, PPP))
    ZZ3 = mul(ZZ1, PP)
    ZZZ3 = mul(ZZZ1, PPP)

    fresh = inf1 & valid
    cancel = (~inf1) & valid & pz & (~rz)
    poison = (~inf1) & valid & pz & rz
    normal = (~inf1) & valid & (~pz)

    zero = jnp.zeros_like(X1)
    Xo = jnp.where(normal, X3, jnp.where(fresh, x2, jnp.where(cancel, zero, X1)))
    Yo = jnp.where(normal, Y3, jnp.where(fresh, y2, jnp.where(cancel, zero, Y1)))
    ZZo = jnp.where(normal, ZZ3, jnp.where(fresh, one_col, jnp.where(cancel, zero, ZZ1)))
    ZZZo = jnp.where(
        normal, ZZZ3, jnp.where(fresh, one_col, jnp.where(cancel, zero, ZZZ1))
    )
    return (Xo, Yo, ZZo, ZZZo), poison


def _fw_point_double(P, p_arr, n0inv):
    X, Y, Z = P
    mul = lambda a, b: _fw_mont_mul(a, b, p_arr, n0inv)  # noqa: E731
    add = lambda a, b: _fw_add(a, b, p_arr)  # noqa: E731
    sub = lambda a, b: _fw_sub(a, b, p_arr)  # noqa: E731

    t0 = mul(Y, Y)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    txy = mul(X, Y)
    z3 = _fw_mul_small(t0, 8, p_arr)
    t2 = _fw_mul_small(t2, B3, p_arr)
    y3 = add(t0, t2)
    t0 = sub(t0, _fw_mul_small(t2, 3, p_arr))
    X3a = mul(t2, z3)
    Z3 = mul(t1, z3)
    Y3a = mul(t0, y3)
    X3b = mul(t0, txy)
    Y3 = add(X3a, Y3a)
    X3 = add(X3b, X3b)
    return X3, Y3, Z3


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _p_col(p: int):
    return jnp.asarray(np.asarray(int_to_limbs(p), np.uint32).reshape(N_LIMBS, 1))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def mul_pallas(
    a: jnp.ndarray, b: jnp.ndarray, p: int, n0inv: int, tile: int, interpret: bool = False
) -> jnp.ndarray:
    """(N,16) x (N,16) Montgomery mul; N % tile == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[0]

    def kernel(p_ref, a_ref, b_ref, out_ref):
        res = _fw_mont_mul(a_ref[:].T, b_ref[:].T, p_ref[:], n0inv)
        out_ref[:] = res.T

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, N_LIMBS), jnp.uint32),
        grid=(n // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(_p_col(p), a, b)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def padd_pallas(
    pts: jnp.ndarray, qts: jnp.ndarray, p: int, n0inv: int, tile: int, interpret: bool = False
):
    """Complete point addition: (N,3,16) x (N,3,16) -> (N,3,16)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]

    def kernel(p_ref, a_ref, b_ref, out_ref):
        pa = a_ref[:]
        qa = b_ref[:]
        P = tuple(pa[:, c, :].T for c in range(3))
        Q = tuple(qa[:, c, :].T for c in range(3))
        X3, Y3, Z3 = _fw_point_add(P, Q, p_ref[:], n0inv)
        out_ref[:] = jnp.stack([X3.T, Y3.T, Z3.T], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, N_LIMBS), jnp.uint32),
        grid=(n // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(_p_col(p), pts, qts)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def pmadd_pallas(
    pts: jnp.ndarray,
    qxy: jnp.ndarray,
    flags: jnp.ndarray,
    p: int,
    n0inv: int,
    tile: int,
    interpret: bool = False,
):
    """Masked complete mixed addition: (N,3,16) + (N,2,16) -> (N,3,16).

    flags (N,1) uint32: bit0 negate Q, bit1 skip (keep P).  One fused kernel
    per MSM bucket-accumulation step — the conditional negate and the
    valid-select never round-trip HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]

    def kernel(p_ref, a_ref, q_ref, f_ref, out_ref):
        pa = a_ref[:]
        qa = q_ref[:]
        P = tuple(pa[:, c, :].T for c in range(3))
        Q = tuple(qa[:, c, :].T for c in range(2))
        flags_row = f_ref[:].T  # (1, tile)
        X3, Y3, Z3 = _fw_point_madd(P, Q, flags_row, p_ref[:], n0inv)
        out_ref[:] = jnp.stack([X3.T, Y3.T, Z3.T], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, N_LIMBS), jnp.uint32),
        grid=(n // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(_p_col(p), pts, qxy, flags)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def pmadd_packed_pallas(
    pts: jnp.ndarray,
    qpk: jnp.ndarray,
    flags: jnp.ndarray,
    p: int,
    n0inv: int,
    tile: int,
    interpret: bool = False,
):
    """Masked mixed addition with PACKED affine addends: (N,3,16) + (N,16).

    ``qpk`` packs Q's 16-bit limbs two-per-u32, split-half order: word j =
    x_limb[j] | x_limb[j+8] << 16 for j<8, then the same for y.  The MSM
    bucket loop is gather-bound (the per-step XLA row gather of addends costs
    ~37 ns/row at 128 B rows vs ~16 ns at 4 B — mostly latency plus ~0.17
    ns/byte), so halving the gathered row to 64 B cuts the dominant phase;
    unpacking in-kernel is one shift+mask+concat per coordinate.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    half = N_LIMBS // 2

    def kernel(p_ref, a_ref, q_ref, f_ref, out_ref):
        pa = a_ref[:]
        qp = q_ref[:].T  # (16, tile): rows 0..7 pack x, rows 8..15 pack y
        P = tuple(pa[:, c, :].T for c in range(3))
        xw, yw = qp[:half], qp[half:]
        x2 = jnp.concatenate([xw & MASK, xw >> LIMB_BITS], axis=0)
        y2 = jnp.concatenate([yw & MASK, yw >> LIMB_BITS], axis=0)
        flags_row = f_ref[:].T  # (1, tile)
        X3, Y3, Z3 = _fw_point_madd(P, (x2, y2), flags_row, p_ref[:], n0inv)
        out_ref[:] = jnp.stack([X3.T, Y3.T, Z3.T], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, N_LIMBS), jnp.uint32),
        grid=(n // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(_p_col(p), pts, qpk, flags)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def pmadd_slab_pallas(
    pts: jnp.ndarray,
    slabs: jnp.ndarray,
    vmask: jnp.ndarray,
    p: int,
    n0inv: int,
    tile: int,
    interpret: bool = False,
):
    """R chained masked mixed-adds per invocation: (N,3,16) + (N,R,16) packed.

    ``slabs[i]`` holds R consecutive pre-sign-applied packed affine rows of
    bucket i's segment (the MSM slab layout); ``vmask`` (N,1) uint32 has bit
    r set iff row r is a real addend.  Chaining R adds inside ONE kernel
    amortizes the accumulator's HBM round-trip and the per-step gather
    latency (the caller gathers R rows with one contiguous-slice gather).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r = pts.shape[0], slabs.shape[1]
    half = N_LIMBS // 2

    def kernel(p_ref, a_ref, s_ref, v_ref, out_ref):
        pa = a_ref[:]
        sl = s_ref[:]
        P = tuple(pa[:, c, :].T for c in range(3))
        vm = v_ref[:].T  # (1, tile)
        for ri in range(r):
            qp = sl[:, ri, :].T  # (16, tile): rows 0..7 pack x, 8..15 pack y
            xw, yw = qp[:half], qp[half:]
            x2 = jnp.concatenate([xw & MASK, xw >> LIMB_BITS], axis=0)
            y2 = jnp.concatenate([yw & MASK, yw >> LIMB_BITS], axis=0)
            skip = ((vm >> ri) & 1) == 0
            P = _fw_point_madd_skip(P, (x2, y2), skip, p_ref[:], n0inv)
        out_ref[:] = jnp.stack([P[0].T, P[1].T, P[2].T], axis=1)

    # r >= 8 slab rows push the Mosaic scoped-vmem stack past the 16 MB
    # default at tile 1024; raise the cap (v5e has 128 MB of VMEM).
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, N_LIMBS), jnp.uint32),
        grid=(n // tile,),
        interpret=interpret,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, r, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(_p_col(p), pts, slabs, vmask)


def _p_one_col(p: int):
    """(16,3) constant columns: limbs of p, Montgomery 1 (2^256 mod p), 2p."""
    one_mont = (1 << 256) % p
    cols = np.stack(
        [
            np.asarray(int_to_limbs(p), np.uint32),
            np.asarray(int_to_limbs(one_mont), np.uint32),
            np.asarray(int_to_limbs(2 * p), np.uint32),
        ],
        axis=1,
    )
    return jnp.asarray(cols)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def pxyzz_slab_pallas(
    acc: jnp.ndarray,
    slabs: jnp.ndarray,
    vmask: jnp.ndarray,
    pflags: jnp.ndarray,
    p: int,
    n0inv: int,
    tile: int,
    interpret: bool = False,
):
    """R chained xyzz mixed-adds per invocation: (N,4,16) + (N,R,16) packed.

    Same slab layout as pmadd_slab_pallas (packed affine rows, signs
    pre-applied, vmask valid bits) but the accumulator is xyzz (X,Y,ZZ,ZZZ;
    identity = all-zero) and the add is the 10-mul incomplete formula of
    _fw_point_madd_xyzz.  Returns (acc', pflags') where pflags' is the
    sticky per-lane poison mask (pflags | any equal-point add detected).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r = acc.shape[0], slabs.shape[1]
    half = N_LIMBS // 2

    def kernel(pc_ref, a_ref, s_ref, v_ref, f_ref, out_ref, fo_ref):
        pa = a_ref[:]
        sl = s_ref[:]
        p_col = pc_ref[:, 0:1]
        one_col = pc_ref[:, 1:2]
        p2_col = pc_ref[:, 2:3]
        P4 = tuple(pa[:, c_, :].T for c_ in range(4))
        vm = v_ref[:].T  # (1, tile)
        poison_any = f_ref[:].T
        for ri in range(r):
            qp = sl[:, ri, :].T
            xw, yw = qp[:half], qp[half:]
            x2 = jnp.concatenate([xw & MASK, xw >> LIMB_BITS], axis=0)
            y2 = jnp.concatenate([yw & MASK, yw >> LIMB_BITS], axis=0)
            valid = ((vm >> ri) & 1) > 0
            P4, poison = _fw_point_madd_xyzz(
                P4, (x2, y2), valid, p_col, p2_col, n0inv, one_col
            )
            poison_any = poison_any | poison.astype(jnp.uint32)
        out_ref[:] = jnp.stack([P4[0].T, P4[1].T, P4[2].T, P4[3].T], axis=1)
        fo_ref[:] = poison_any.T

    # The 4-coordinate state + r slab rows push Mosaic's scoped-vmem stack
    # past the 16 MB default at tile >= 1024; raise the cap (v5e has 128 MB
    # of VMEM) instead of shrinking the tile and paying 2x grid launches.
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 4, N_LIMBS), jnp.uint32),
            jax.ShapeDtypeStruct((n, 1), jnp.uint32),
        ),
        grid=(n // tile,),
        interpret=interpret,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, r, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 4, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(_p_one_col(p), acc, slabs, vmask, pflags)


# The xyzz slab kernel keeps 4 coordinate rows + R slab rows + ~6 live
# temporaries per lane; at tile=1024 Mosaic's scoped-vmem stack needs ~24 MB
# (over the 16 MB default, raised via CompilerParams.vmem_limit_bytes).
XYZZ_TILE = 1024


def pxyzz_slab_pallas_auto(field, acc, slabs, vmask, pflags, tile: int = XYZZ_TILE):
    """Flatten/pad wrapper around pxyzz_slab_pallas."""
    batch = acc.shape[:-2]
    r = slabs.shape[-2]
    n = int(np.prod(batch)) if batch else 1
    af = acc.reshape(n, 4, N_LIMBS)
    sf = slabs.reshape(n, r, N_LIMBS)
    vf = vmask.reshape(n, 1).astype(jnp.uint32)
    ff = pflags.reshape(n, 1).astype(jnp.uint32)
    t = _pick_tile(n, tile)
    af, real_n = _pad_to(af, t)
    sf, _ = _pad_to(sf, t)
    pad = (-n) % t
    if pad:
        vf = jnp.concatenate([vf, jnp.zeros((pad, 1), jnp.uint32)], axis=0)
        ff = jnp.concatenate([ff, jnp.zeros((pad, 1), jnp.uint32)], axis=0)
    out, fo = pxyzz_slab_pallas(af, sf, vf, ff, field.p, field.n0inv, t, _INTERPRET)
    return (
        out[:real_n].reshape(*batch, 4, N_LIMBS),
        fo[:real_n].reshape(*batch),
    )


def pmadd_slab_pallas_auto(field, pts, slabs, vmask, tile: int = DEFAULT_TILE):
    """Flatten/pad wrapper around pmadd_slab_pallas; vmask (…,) uint32 bits."""
    batch = pts.shape[:-2]
    r = slabs.shape[-2]
    n = int(np.prod(batch)) if batch else 1
    pf = pts.reshape(n, 3, N_LIMBS)
    sf = slabs.reshape(n, r, N_LIMBS)
    vf = vmask.reshape(n, 1).astype(jnp.uint32)
    t = _pick_tile(n, tile)
    pf, real_n = _pad_to(pf, t)
    sf, _ = _pad_to(sf, t)
    v_pad = (-n) % t
    if v_pad:
        vf = jnp.concatenate([vf, jnp.zeros((v_pad, 1), jnp.uint32)], axis=0)
    out = pmadd_slab_pallas(pf, sf, vf, field.p, field.n0inv, t, _INTERPRET)[:real_n]
    return out.reshape(*batch, 3, N_LIMBS)


def pmadd_packed_pallas_auto(field, pts, qpk, flags, tile: int = DEFAULT_TILE):
    """Flatten/pad wrapper around pmadd_packed_pallas; flags (…,) uint32."""
    batch = pts.shape[:-2]
    n = int(np.prod(batch)) if batch else 1
    pf = pts.reshape(n, 3, N_LIMBS)
    qf = qpk.reshape(n, N_LIMBS)
    ff = flags.reshape(n, 1).astype(jnp.uint32)
    t = _pick_tile(n, tile)
    pf, real_n = _pad_to(pf, t)
    qf, _ = _pad_to(qf, t)
    ff_pad = (-n) % t
    if ff_pad:
        ff = jnp.concatenate([ff, jnp.full((ff_pad, 1), 2, jnp.uint32)], axis=0)
    out = pmadd_packed_pallas(pf, qf, ff, field.p, field.n0inv, t, _INTERPRET)[:real_n]
    return out.reshape(*batch, 3, N_LIMBS)


def pmadd_pallas_auto(field, pts, qxy, flags, tile: int = DEFAULT_TILE):
    """Flatten/pad wrapper around pmadd_pallas; flags (…,) uint32."""
    batch = pts.shape[:-2]
    n = int(np.prod(batch)) if batch else 1
    pf = pts.reshape(n, 3, N_LIMBS)
    qf = qxy.reshape(n, 2, N_LIMBS)
    ff = flags.reshape(n, 1).astype(jnp.uint32)
    t = _pick_tile(n, tile)
    pf, real_n = _pad_to(pf, t)
    qf, _ = _pad_to(qf, t)
    ff_pad = (-n) % t
    if ff_pad:
        # padded slots: skip (keep P = zero rows)
        ff = jnp.concatenate([ff, jnp.full((ff_pad, 1), 2, jnp.uint32)], axis=0)
    out = pmadd_pallas(pf, qf, ff, field.p, field.n0inv, t, _INTERPRET)[:real_n]
    return out.reshape(*batch, 3, N_LIMBS)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def pdbl_pallas(pts: jnp.ndarray, p: int, n0inv: int, tile: int, interpret: bool = False):
    """Complete point doubling: (N,3,16) -> (N,3,16)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]

    def kernel(p_ref, a_ref, out_ref):
        pa = a_ref[:]
        P = tuple(pa[:, c, :].T for c in range(3))
        X3, Y3, Z3 = _fw_point_double(P, p_ref[:], n0inv)
        out_ref[:] = jnp.stack([X3.T, Y3.T, Z3.T], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, N_LIMBS), jnp.uint32),
        grid=(n // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 3, N_LIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(_p_col(p), pts)


# ---------------------------------------------------------------------------
# batch-affine bucket accumulation (the MSM slab loop's cheapest kernel)
#
# Accumulators are AFFINE (x, y) plus an occupancy bit: a mixed add is then
# lambda = (y2-y1)/(x2-x1), x3 = lambda^2-x1-x2, y3 = lambda(x1-x3)-y1 —
# 3 muls + 1 inverse vs the xyzz kernel's 10 muls.  The inverse is batched
# with Montgomery's trick per STEP across all lanes: an up-sweep of chained
# chunk products (1 mul/lane, phase 1), ONE vectorized Fermat pow over the
# per-tile chain products (phase 2), and a down-sweep (2 muls/lane) fused
# with the add formulas (phase 3) — ~6 muls/lane total.  Like xyzz, the
# P == Q (doubling) case is detected and poison-flagged, not computed;
# empty accumulators assign and cancellation empties the lane.  All field
# arithmetic runs over the lazy [0, 2p) domain.
# ---------------------------------------------------------------------------

AFFINE_TILE = int(os.environ.get("ZKTPU_AFFINE_TILE", "8192"))
# Chains span AFFINE_G chunks of width tile/AFFINE_G.  G trades chain-link
# WIDTH against batch-inverse width: G=64 (128-lane links) measured ~4x
# worse than modeled — a (16,128) mul is only 2 VPU issues and the chain is
# serially dependent, so the pipeline drains between ops.  Smaller G widens
# the links toward throughput-bound (at G=4 a link is 2048 lanes = 32
# vregs/op) at the cost of more chain products into the phase-2 inverse
# (tree-reduced there — wide, parallel levels — so the growth is cheap).
# Env-tunable for pipeline-level A/B on real hardware (the axon tunnel
# elides repeated microbench dispatches, so only end-to-end timing is
# trustworthy; see NOTES.md "Measurement hygiene").
AFFINE_G = int(os.environ.get("ZKTPU_AFFINE_G", "16"))
AFFINE_FERMAT_W = 128  # phase-2 tree reduces to this width before the pow


def _vmem_limit_bytes() -> int:
    """Scoped-vmem cap for the big fused kernels, derived from the device.

    v4/v5 TensorCores carry 128 MB of VMEM (cap at 100 MB working set);
    older v2/v3 cores only 16 MB (cap below it so Mosaic degrades to more
    grid steps instead of failing to compile)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - no backend at trace time
        return 64 * 1024 * 1024
    if "v2" in kind or "v3" in kind:
        return 14 * 1024 * 1024
    return 100 * 1024 * 1024


def _unpack_packed_rows(rT):
    """(16,T) packed affine rows -> (x2, y2) each (16,T) canonical limbs."""
    xw, yw = rT[: N_LIMBS // 2], rT[N_LIMBS // 2 :]
    x2 = jnp.concatenate([xw & MASK, xw >> LIMB_BITS], axis=0)
    y2 = jnp.concatenate([yw & MASK, yw >> LIMB_BITS], axis=0)
    return x2, y2


def _affine_step_masks(d, num, occ_row, val_row, p_col):
    """Shared phase-1/3 lane classification (must be bit-identical between
    the prep and apply kernels: both recompute it from the same inputs)."""
    dz = _fw_is_zero_2p(d, p_col)
    numz = _fw_is_zero_2p(num, p_col) if num is not None else None
    occb = occ_row > 0
    val = val_row > 0
    active = val & occb & (~dz)
    fresh = val & (~occb)
    poison = None if numz is None else (val & occb & dz & numz)
    cancel = None if numz is None else (val & occb & dz & (~numz))
    return active, fresh, poison, cancel, occb


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def paffine_prep_pallas(
    ax: jnp.ndarray,
    occ: jnp.ndarray,
    rows: jnp.ndarray,
    vmask: jnp.ndarray,
    p: int,
    n0inv: int,
    tile: int,
    interpret: bool = False,
):
    """Batch-affine step phase 1: substituted-denominator chain prefixes.

    Per lane: d = x2 - x1 over the lazy domain; inactive lanes (invalid,
    empty accumulator, or d == 0) substitute 1 so every chain product stays
    invertible.  Chains run across the tile/128 chunks of each grid tile:
    output column k*128+j holds prod_{i<=k} dsub[i*128+j] (the Montgomery-
    trick up-sweep, ~1 mul/lane).  The LAST chunk of each tile is that
    tile's 128 chain products — phase 2 (pbatchinv_pallas) inverts those.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ax.shape[0]
    g = AFFINE_G
    cw = tile // g

    def kernel(pc_ref, a_ref, o_ref, r_ref, v_ref, out_ref):
        p_col = pc_ref[:, 0:1]
        one_col = pc_ref[:, 1:2]
        p2_col = pc_ref[:, 2:3]
        axT = a_ref[:].T
        x2, _ = _unpack_packed_rows(r_ref[:].T)
        d = _fw_sub_2p(x2, axT, p2_col)
        active, _, _, _, _ = _affine_step_masks(
            d, None, o_ref[:].T, v_ref[:].T, p_col
        )
        dsub = jnp.where(active, d, one_col)
        c = dsub[:, :cw]
        outs = [c]
        for k in range(1, g):
            c = _fw_mont_mul_lazy(c, dsub[:, k * cw : (k + 1) * cw], p_col, n0inv)
            outs.append(c)
        out_ref[:] = jnp.concatenate(outs, axis=1).T

    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes())
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, N_LIMBS), jnp.uint32),
        grid=(n // tile,),
        interpret=interpret,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(_p_one_col(p), ax, occ, rows, vmask)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pbatchinv_pallas(prods: jnp.ndarray, p: int, n0inv: int, interpret: bool = False):
    """Vectorized batch inverse of M chain products (M a power of two >= 256).

    One kernel: tree-reduce the M products to 128 lanes (pairing i with
    i + half at every level), ONE Fermat pow a^(p-2) on the (16,128) root
    (LSB square-and-multiply fori over a bit-table input — tiny graph, 512
    lazy muls at the VPU's minimum issue width), then tree-expand inverses
    back out (inv_left = inv * right, inv_right = inv * left).  Amortized
    ~3 muls per product + the fixed Fermat; all in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = prods.shape[0]
    assert m >= 256 and m & (m - 1) == 0, "M must be a power of two >= 256"
    exp = p - 2
    bits_np = np.array([[(exp >> i) & 1 for i in range(256)]], np.uint32)

    def kernel(pc_ref, bits_ref, q_ref, out_ref):
        p_col = pc_ref[:, 0:1]
        one_col = pc_ref[:, 1:2]
        q = q_ref[:].T  # (16, m)
        levels = []
        while q.shape[1] > AFFINE_FERMAT_W:
            half = q.shape[1] // 2
            levels.append(q)
            q = _fw_mont_mul_lazy(q[:, :half], q[:, half:], p_col, n0inv)
        bits = bits_ref[:]  # (1, 256)
        idx_row = jax.lax.broadcasted_iota(jnp.uint32, bits.shape, 1)
        r0 = jnp.broadcast_to(one_col, q.shape)

        def fermat_body(i, carry):
            # bit i via masked reduce: Mosaic has no dynamic_slice on TPU
            # (and no unsigned reductions — go through int32)
            r, s = carry
            bit = jnp.sum(jnp.where(idx_row == i, bits, 0).astype(jnp.int32))
            r2 = _fw_mont_mul_lazy(r, s, p_col, n0inv)
            r = jnp.where(bit > 0, r2, r)
            s = _fw_mont_mul_lazy(s, s, p_col, n0inv)
            return r, s

        inv, _ = jax.lax.fori_loop(0, 256, fermat_body, (r0, q))
        for lvl in reversed(levels):
            half = lvl.shape[1] // 2
            inv_l = _fw_mont_mul_lazy(inv, lvl[:, half:], p_col, n0inv)
            inv_r = _fw_mont_mul_lazy(inv, lvl[:, :half], p_col, n0inv)
            inv = jnp.concatenate([inv_l, inv_r], axis=1)
        out_ref[:] = inv.T

    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes())
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, N_LIMBS), jnp.uint32),
        grid=(1,),
        interpret=interpret,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, N_LIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, N_LIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(_p_one_col(p), jnp.asarray(bits_np), prods)


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def paffine_apply_pallas(
    ax: jnp.ndarray,
    ay: jnp.ndarray,
    occ: jnp.ndarray,
    pflags: jnp.ndarray,
    rows: jnp.ndarray,
    vmask: jnp.ndarray,
    cp: jnp.ndarray,
    ichain: jnp.ndarray,
    p: int,
    n0inv: int,
    tile: int,
    interpret: bool = False,
):
    """Batch-affine step phase 3: down-sweep + fused affine mixed add.

    Recomputes phase 1's lane classification (same inputs -> bit-identical),
    walks each tile's inverse chain product back down (inv_d per chunk, 2
    muls/lane), and applies lambda = num * inv_d, x3 = lambda^2 - x1 - x2,
    y3 = lambda (x1 - x3) - y1 with the branchless selects:

      fresh  (valid, empty lane)            -> assign (x2, y2), occupy
      cancel (d == 0, num != 0: P == -Q)    -> empty the lane
      poison (d == 0, num == 0: P == Q)     -> keep, set sticky flag
      active                                -> (x3, y3)

    Returns (ax', ay', occ', pflags').
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ax.shape[0]
    g = AFFINE_G
    ch = tile // g

    def kernel(
        pc_ref, a_ref, b_ref, o_ref, f_ref, r_ref, v_ref, c_ref, i_ref,
        ao_ref, bo_ref, oo_ref, fo_ref,
    ):
        p_col = pc_ref[:, 0:1]
        one_col = pc_ref[:, 1:2]
        p2_col = pc_ref[:, 2:3]
        mul = lambda a, b: _fw_mont_mul_lazy(a, b, p_col, n0inv)  # noqa: E731
        sub = lambda a, b: _fw_sub_2p(a, b, p2_col)  # noqa: E731

        axT = a_ref[:].T
        ayT = b_ref[:].T
        x2, y2 = _unpack_packed_rows(r_ref[:].T)
        d = sub(x2, axT)
        num = sub(y2, ayT)
        active, fresh, poison, cancel, occb = _affine_step_masks(
            d, num, o_ref[:].T, v_ref[:].T, p_col
        )
        dsub = jnp.where(active, d, one_col)
        cp_t = c_ref[:].T  # (16, tile) chain prefixes
        ic = i_ref[:].T  # (16, tile/G) inverse of each chain's full product
        lam_chunks: list = [None] * g
        for k in range(g - 1, 0, -1):
            invd = mul(ic, cp_t[:, (k - 1) * ch : k * ch])
            lam_chunks[k] = mul(num[:, k * ch : (k + 1) * ch], invd)
            ic = mul(ic, dsub[:, k * ch : (k + 1) * ch])
        lam_chunks[0] = mul(num[:, :ch], ic)
        lam = jnp.concatenate(lam_chunks, axis=1)
        x3 = sub(sub(mul(lam, lam), axT), x2)
        y3 = sub(mul(lam, sub(axT, x3)), ayT)

        axo = jnp.where(active, x3, jnp.where(fresh, x2, axT))
        ayo = jnp.where(active, y3, jnp.where(fresh, y2, ayT))
        occo = (occb | fresh) & (~cancel)
        ao_ref[:] = axo.T
        bo_ref[:] = ayo.T
        oo_ref[:] = occo.astype(jnp.uint32).T
        fo_ref[:] = (f_ref[:].T | poison.astype(jnp.uint32)).T

    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes())
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, N_LIMBS), jnp.uint32),
            jax.ShapeDtypeStruct((n, N_LIMBS), jnp.uint32),
            jax.ShapeDtypeStruct((n, 1), jnp.uint32),
            jax.ShapeDtypeStruct((n, 1), jnp.uint32),
        ),
        grid=(n // tile,),
        interpret=interpret,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((N_LIMBS, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile // AFFINE_G, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(_p_one_col(p), ax, ay, occ, pflags, rows, vmask, cp, ichain)


# pbatchinv_pallas holds its whole input plus every tree level in one VMEM
# tile; cap the in-kernel width and fold larger inputs down to it with the
# gridded pallas mul (strict muls are value-equivalent mod p and their
# canonical outputs stay inside the kernels' lazy [0,2p) domain).
BATCHINV_MAX_M = 32768


def paffine_step_pallas_auto(field, ax, ay, occ, rows, vmask, pflags, tile: int = AFFINE_TILE):
    """One batch-affine accumulation step = prep -> batchinv -> apply.

    All arrays are width-major: ax/ay/rows (n,16), occ/vmask/pflags (n,1)
    uint32; n must be a multiple of ``tile`` (the MSM glue pads the tier
    state once, outside its step loop).  Returns (ax', ay', occ', pflags').
    """
    n = ax.shape[0]
    t = min(tile, n)
    cw = t // AFFINE_G
    assert cw >= 1 and n % t == 0 and t % AFFINE_G == 0, (n, t)
    cp = paffine_prep_pallas(ax, occ, rows, vmask, field.p, field.n0inv, t, _INTERPRET)
    ntiles = n // t
    m = ntiles * cw
    prods = cp.reshape(ntiles, t, N_LIMBS)[:, -cw:, :].reshape(m, N_LIMBS)
    m2 = max(256, 1 << (m - 1).bit_length())
    if m2 != m:
        pad = jnp.broadcast_to(field.one_mont, (m2 - m, N_LIMBS))
        prods = jnp.concatenate([prods, pad], axis=0)
    # outer Montgomery-trick levels (pairing i with i+half, matching the
    # in-kernel tree) until the root fits the single-tile inverse kernel
    levels = []
    while prods.shape[0] > BATCHINV_MAX_M:
        half = prods.shape[0] // 2
        levels.append(prods)
        prods = mul_pallas_auto(field, prods[:half], prods[half:])
    inv = pbatchinv_pallas(prods, field.p, field.n0inv, _INTERPRET)
    for lvl in reversed(levels):
        half = lvl.shape[0] // 2
        inv_l = mul_pallas_auto(field, inv, lvl[half:])
        inv_r = mul_pallas_auto(field, inv, lvl[:half])
        inv = jnp.concatenate([inv_l, inv_r], axis=0)
    return paffine_apply_pallas(
        ax, ay, occ, pflags, rows, vmask, cp, inv[:m],
        field.p, field.n0inv, t, _INTERPRET,
    )


def _pad_to(arr, tile):
    n = arr.shape[0]
    pad = (-n) % tile
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], jnp.uint32)], axis=0)
    return arr, n


def _pick_tile(n, tile):
    if n >= tile:
        return tile
    t = max(128, 1 << (n - 1).bit_length() if n > 1 else 128)
    return min(t, tile)


def mul_pallas_auto(field, a, b, tile: int = DEFAULT_TILE):
    """Broadcast/flatten/pad wrapper around mul_pallas for (…,16) operands."""
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    af = a.reshape(n, N_LIMBS)
    bf = b.reshape(n, N_LIMBS)
    t = _pick_tile(n, tile)
    af, real_n = _pad_to(af, t)
    bf, _ = _pad_to(bf, t)
    out = mul_pallas(af, bf, field.p, field.n0inv, t, _INTERPRET)[:real_n]
    return out.reshape(*batch, N_LIMBS)


def padd_pallas_auto(field, pts, qts, tile: int = DEFAULT_TILE):
    """Broadcast/flatten/pad wrapper around padd_pallas for (…,3,16) points."""
    pts, qts = jnp.broadcast_arrays(pts, qts)
    batch = pts.shape[:-2]
    n = int(np.prod(batch)) if batch else 1
    pf = pts.reshape(n, 3, N_LIMBS)
    qf = qts.reshape(n, 3, N_LIMBS)
    t = _pick_tile(n, tile)
    pf, real_n = _pad_to(pf, t)
    qf, _ = _pad_to(qf, t)
    out = padd_pallas(pf, qf, field.p, field.n0inv, t, _INTERPRET)[:real_n]
    return out.reshape(*batch, 3, N_LIMBS)


def pdbl_pallas_auto(field, pts, tile: int = DEFAULT_TILE):
    batch = pts.shape[:-2]
    n = int(np.prod(batch)) if batch else 1
    pf = pts.reshape(n, 3, N_LIMBS)
    t = _pick_tile(n, tile)
    pf, real_n = _pad_to(pf, t)
    out = pdbl_pallas(pf, field.p, field.n0inv, t, _INTERPRET)[:real_n]
    return out.reshape(*batch, 3, N_LIMBS)
