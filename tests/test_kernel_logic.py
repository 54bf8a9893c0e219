"""Eager parity tests for the Mosaic kernel building blocks (fields/pallas_ops).

The pallas kernels are the TPU hot path for the MSM bucket loop.  Full-kernel
interpret-mode parity (tests/test_pallas_interpret.py) de-sugars each kernel
into a 3k-14k-op XLA graph that XLA:CPU compiles at ~40 ms/op — minutes per
test — so those are gated behind ZKTPU_SLOW_TESTS.  This file tests the SAME
kernel arithmetic (the _fw_* functions the kernels are literally built from:
limb layout, Kogge-Stone carries, Montgomery bounds, lazy-domain reductions,
mask/select arms) by calling them EAGERLY on (16, T) limb-major arrays — no
pallas_call, no jit, seconds per test.  The pallas_call plumbing (BlockSpecs,
in-kernel transposes, packing) is covered by the cheap interpret tests below
the gate plus bench.py's full-size closed-form oracle check on real TPU.

Oracle: the exact host bignum implementation (fields/host.py, curve/host.py).
"""

import numpy as np
import jax.numpy as jnp

from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.fields import pallas_ops as P
from zkapps_tpu.fields.host import Fq
from zkapps_tpu.fields.jnp_ops import FQ
from zkapps_tpu.fields.limbs import N_LIMBS

T = 32
P_COL = jnp.asarray(np.asarray(P._p_one_col(Fq.p))[:, 0:1])
ONE_COL = jnp.asarray(np.asarray(P._p_one_col(Fq.p))[:, 1:2])
P2_COL = jnp.asarray(np.asarray(P._p_one_col(Fq.p))[:, 2:3])
R_INV = pow(1 << 256, Fq.p - 2, Fq.p)


def enc_T(vals, mont=True):
    """Host ints -> (16, T) limb-major Montgomery columns."""
    return jnp.asarray(np.asarray(FQ.encode(vals, mont=mont)).T)


def dec_T(arr, mont=True):
    """(16, T) limb-major -> host ints (tolerates lazy [0, 2p) values)."""
    vals = []
    a = np.asarray(arr).T
    for row in a:
        v = int.from_bytes(b"".join(int(x).to_bytes(2, "little") for x in row), "little")
        if mont:
            v = v * R_INV % Fq.p
        else:
            v = v % Fq.p
        vals.append(v)
    return vals


def rand_elems(rng, k):
    return [int.from_bytes(rng.bytes(31), "little") % Fq.p for _ in range(k)]


def test_fw_mont_mul_strict_and_lazy():
    rng = np.random.default_rng(2)
    xs = rand_elems(rng, T)
    ys = rand_elems(rng, T)
    xs[:4] = [0, 1, Fq.p - 1, Fq.p - 1]
    ys[:4] = [5, Fq.p - 1, Fq.p - 1, 1]
    a, b = enc_T(xs), enc_T(ys)
    want = [(x * y) % Fq.p for x, y in zip(xs, ys)]
    out = P._fw_mont_mul(a, b, P_COL, FQ.n0inv)
    assert dec_T(out) == want
    # strict result must be canonical (< p)
    raw = [int.from_bytes(b"".join(int(v).to_bytes(2, "little") for v in row), "little")
           for row in np.asarray(out).T]
    assert all(v < Fq.p for v in raw)
    out_l = P._fw_mont_mul_lazy(a, b, P_COL, FQ.n0inv)
    assert dec_T(out_l) == want


def test_fw_lazy_domain_closure():
    """mul_lazy/add_2p/sub_2p stay in [0, 2p) and stay correct when chained
    on non-canonical inputs — the xyzz kernel's operating invariant."""
    rng = np.random.default_rng(3)
    xs = rand_elems(rng, T)
    ys = rand_elems(rng, T)
    a, b = enc_T(xs), enc_T(ys)
    # force lazy representatives: x + p (values in [p, 2p))
    a_lazy = a + P_COL  # limb-wise sum stays < 2^17; resolve to canonical limbs
    a_lazy, _ = P._resolve_carries(a_lazy)
    for i in range(3):  # chain: ((a*b)+b)*b - a ... all in lazy domain
        m = P._fw_mont_mul_lazy(a_lazy, b, P_COL, FQ.n0inv)
        s = P._fw_add_2p(m, b, P2_COL)
        d = P._fw_sub_2p(s, a_lazy, P2_COL)
        a_lazy = d
    # reference on host values: per round x <- x*y + y - x  (mod p); the
    # Montgomery encodings track the same recurrence on the values
    want = xs
    for _ in range(3):
        want = [((x * y) + y - x) % Fq.p for x, y in zip(want, ys)]
    assert dec_T(a_lazy) == want
    raw = [int.from_bytes(b"".join(int(v).to_bytes(2, "little") for v in row), "little")
           for row in np.asarray(a_lazy).T]
    assert all(v < 2 * Fq.p for v in raw)


def test_fw_is_zero_2p():
    vals = enc_T([0, 1, Fq.p - 1, 7], mont=False)
    # representation p (residue zero, non-zero limbs)
    rep_p = jnp.concatenate([P_COL, enc_T([1], mont=False)], axis=1)
    z = np.asarray(P._fw_is_zero_2p(vals, P_COL))[0]
    assert list(z) == [True, False, False, False]
    z2 = np.asarray(P._fw_is_zero_2p(rep_p, P_COL))[0]
    assert list(z2) == [True, False]


def _points_cols(pts):
    """Host points -> three (16,T) projective Montgomery columns."""
    enc = np.asarray(G1_JNP.encode(pts))  # (T,3,16)
    return tuple(jnp.asarray(enc[:, i, :].T) for i in range(3))


def _affine_cols(pts):
    enc = np.asarray(G1_JNP.encode(pts))
    return jnp.asarray(enc[:, 0, :].T), jnp.asarray(enc[:, 1, :].T)


def _decode_proj_cols(cols):
    X, Y, Z = (np.asarray(c).T for c in cols)
    arr = np.stack([X, Y, Z], axis=1)
    return G1_JNP.decode(arr)


def test_fw_point_madd_parity():
    """Complete mixed add (the 'complete' scheme's kernel body)."""
    g = G1.generator()
    pts = [g.mul(i + 2) for i in range(T)]
    qts = [g.mul(3 * i + 5) for i in range(T)]
    qts[3] = pts[3].neg()  # P + (-P)
    qts[4] = pts[4]  # P + P
    pts[6] = G1.identity()
    flags = np.zeros((1, T), np.uint32)
    flags[0, 5] = 1  # negate
    flags[0, 7] = 2  # skip
    Pc = _points_cols(pts)
    x2, y2 = _affine_cols(qts)
    out = P._fw_point_madd(Pc, (x2, y2), jnp.asarray(flags), P_COL, FQ.n0inv)
    dec = _decode_proj_cols(out)
    for i in range(T):
        if flags[0, i] == 1:
            exp = pts[i].add(qts[i].neg())
        elif flags[0, i] == 2:
            exp = pts[i]
        else:
            exp = pts[i].add(qts[i])
        assert dec[i].to_bytes() == exp.to_bytes(), i


def test_fw_point_madd_skip_parity():
    """The complete slab kernel's chained-step body (skip mask only)."""
    g = G1.generator()
    pts = [g.mul(i + 11) for i in range(T)]
    qts = [g.mul(7 * i + 3) for i in range(T)]
    qts[2] = pts[2].neg()
    pts[9] = G1.identity()
    skip = np.zeros((1, T), bool)
    skip[0, 4] = True
    Pc = _points_cols(pts)
    x2, y2 = _affine_cols(qts)
    out = P._fw_point_madd_skip(Pc, (x2, y2), jnp.asarray(skip), P_COL, FQ.n0inv)
    dec = _decode_proj_cols(out)
    for i in range(T):
        exp = pts[i] if skip[0, i] else pts[i].add(qts[i])
        assert dec[i].to_bytes() == exp.to_bytes(), i


def test_fw_point_madd_xyzz_parity():
    """The xyzz slab kernel body: every select arm + poison + lazy chaining.

    Chains 4 adds per lane exactly like the kernel's r-loop, with fresh
    accumulators, negated rows, masked rows, exact cancellation and an
    equal-point (poison) row.
    """
    rng = np.random.default_rng(41)
    g = G1.generator()
    n, r = T, 4
    acc_pts = [g.mul(1000 + 3 * i) for i in range(n)]
    fresh_lanes = {4, 9}
    addends = [[g.mul(17 * i + 5 * ri + 2) for ri in range(r)] for i in range(n)]
    neg_row = rng.integers(0, 2, size=(n, r)).astype(bool)
    vmask_bits = rng.integers(0, 2, size=(n, r)).astype(bool)
    vmask_bits[3] = False
    vmask_bits[6] = True
    neg_row[6][0] = False
    neg_row[6][1] = True
    addends[6][1] = acc_pts[6].add(addends[6][0])  # cancels at row 1
    poison_lanes = {11}
    vmask_bits[11] = True
    neg_row[11][2] = False

    # expected + resolve poison addend
    expected = []
    poison_expect = np.zeros(n, bool)
    for i in range(n):
        cur = G1.identity() if i in fresh_lanes else acc_pts[i]
        for ri in range(r):
            if not vmask_bits[i][ri]:
                continue
            if i in poison_lanes and ri == 2:
                addends[i][ri] = cur
                poison_expect[i] = True
                continue
            q = addends[i][ri].neg() if neg_row[i][ri] else addends[i][ri]
            cur = cur.add(q)
        expected.append(cur)

    # xyzz accumulator columns: fresh all-zero, else (x, y, 1, 1)
    enc = np.asarray(G1_JNP.encode(acc_pts))
    acc4 = np.zeros((n, 4, N_LIMBS), np.uint32)
    for i in range(n):
        if i in fresh_lanes:
            continue
        acc4[i, 0], acc4[i, 1] = enc[i, 0], enc[i, 1]
        acc4[i, 2] = acc4[i, 3] = enc[i, 2]
    P4 = tuple(jnp.asarray(acc4[:, k, :].T) for k in range(4))
    poison_any = jnp.zeros((1, n), jnp.uint32)
    for ri in range(r):
        rows = []
        for i in range(n):
            q = addends[i][ri].neg() if neg_row[i][ri] else addends[i][ri]
            rows.append(q if vmask_bits[i][ri] else G1.generator())  # dummy
        x2, y2 = _affine_cols(rows)
        valid = jnp.asarray(vmask_bits[:, ri][None])
        P4, poison = P._fw_point_madd_xyzz(
            P4, (x2, y2), valid, P_COL, P2_COL, FQ.n0inv, ONE_COL
        )
        poison_any = poison_any | poison.astype(jnp.uint32)

    flags = np.asarray(poison_any)[0]
    # convert xyzz -> projective on host ints
    X, Y, ZZ, ZZZ = (dec_T(c) for c in P4)
    zz_raw = np.asarray(P4[2]).T
    for i in range(n):
        assert bool(flags[i]) == bool(poison_expect[i]), f"flag {i}"
        if all(v == 0 for v in zz_raw[i]):
            assert expected[i].is_identity, i
            continue
        zz_inv = pow(ZZ[i], Fq.p - 2, Fq.p)
        zzz_inv = pow(ZZZ[i], Fq.p - 2, Fq.p)
        got = G1(X[i] * zz_inv % Fq.p, Y[i] * zzz_inv % Fq.p)
        assert got.to_bytes() == expected[i].to_bytes(), i


def test_fw_point_double_parity():
    g = G1.generator()
    pts = [g.mul(i + 3) for i in range(T)]
    Pc = _points_cols(pts)
    out = P._fw_point_double(Pc, P_COL, FQ.n0inv)
    dec = _decode_proj_cols(out)
    for i in range(T):
        assert dec[i].to_bytes() == pts[i].double().to_bytes(), i
