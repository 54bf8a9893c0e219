"""Pallas kernel parity on CPU via interpret mode.

The Mosaic kernels (fields/pallas_ops.py) are the TPU hot path for the MSM
bucket loop; nothing else in the CPU suite executes them.  Interpret mode
runs the same kernel python against the same block layout as de-sugared jax
ops, so kernel-logic regressions (limb bounds, carry resolution, masking)
are caught without a TPU.

Oracle: the exact host bignum implementation (fields/host.py, curve/host.py).

COST NOTE: the point-op kernels de-sugar to 3k-14k-op XLA graphs that
XLA:CPU compiles at ~40 ms/op — 2-10 MINUTES per test — so they are gated
behind ZKTPU_SLOW_TESTS=1.  The same kernel arithmetic is covered in seconds
by tests/test_kernel_logic.py (eager _fw_* parity); what the gated tests add
is the pallas_call plumbing (BlockSpecs, in-kernel transposes), which
bench.py's closed-form oracle also validates at full size on real TPU.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.fields import pallas_ops as P
from zkapps_tpu.fields.host import Fq
from zkapps_tpu.fields.jnp_ops import FQ

TILE = 128

slow = pytest.mark.skipif(
    os.environ.get("ZKTPU_SLOW_TESTS") != "1",
    reason="XLA:CPU compile of the de-sugared kernel graph takes minutes; "
    "set ZKTPU_SLOW_TESTS=1 (kernel logic is covered by test_kernel_logic.py)",
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    P.set_interpret(True)
    yield
    P.set_interpret(False)


def test_mul_pallas_parity():
    rng = np.random.default_rng(11)
    xs = [int.from_bytes(rng.bytes(31), "little") % Fq.p for _ in range(TILE)]
    ys = [int.from_bytes(rng.bytes(31), "little") % Fq.p for _ in range(TILE)]
    # edge cases: 0, 1, p-1, p-1 squared against itself
    xs[:4] = [0, 1, Fq.p - 1, Fq.p - 1]
    ys[:4] = [5, Fq.p - 1, Fq.p - 1, 1]
    out = P.mul_pallas_auto(FQ, FQ.encode(xs), FQ.encode(ys), tile=TILE)
    assert FQ.decode(out) == [(x * y) % Fq.p for x, y in zip(xs, ys)]


@slow
def test_pmadd_packed_pallas_parity():
    g = G1.generator()
    pts = [g.mul(i + 7) for i in range(32)]
    qts = [g.mul(5 * i + 3) for i in range(32)]
    qts[2] = pts[2].neg()
    pts[9] = G1.identity()
    enc_p = G1_JNP.encode(pts)
    qpk = G1_JNP.pack_affine(G1_JNP.encode(qts)[:, :2])
    flags = np.zeros((32,), np.uint32)
    flags[4] = 1
    flags[6] = 2
    out = P.pmadd_packed_pallas_auto(FQ, enc_p, jnp.asarray(qpk), jnp.asarray(flags), tile=TILE)
    dec = G1_JNP.decode(np.asarray(out))
    for i, (pt, qt) in enumerate(zip(pts, qts)):
        if flags[i] == 1:
            exp = pt.add(qt.neg())
        elif flags[i] == 2:
            exp = pt
        else:
            exp = pt.add(qt)
        assert dec[i].to_bytes() == exp.to_bytes(), i


@slow
def test_pmadd_slab_pallas_parity():
    """Parity for the production MSM slab kernel (sorted scheme hot path).

    Mirrors the slab layout _bucket_accumulate_sorted feeds it: R packed
    affine addend rows per accumulator with digit signs PRE-APPLIED to y
    (so some rows are negated copies), a random per-row valid bitmask, and
    zero rows in invalid slots (the padded-tail case).  Oracle: host bignum
    chain of complete adds.
    """
    rng = np.random.default_rng(23)
    g = G1.generator()
    n, r = 32, 4
    pts = [g.mul(i + 11) for i in range(n)]
    pts[9] = G1.identity()  # fresh accumulator lane
    addends = [[g.mul(7 * i + 3 * ri + 1) for ri in range(r)] for i in range(n)]
    addends[5][1] = pts[5].neg()  # P + (-P) -> identity mid-chain
    addends[6][0] = pts[6]  # P + P -> double
    neg_row = rng.integers(0, 2, size=(n, r)).astype(bool)  # pre-applied signs
    vmask_bits = rng.integers(0, 2, size=(n, r)).astype(bool)
    vmask_bits[3] = False  # fully-skipped lane
    vmask_bits[4] = True  # fully-live lane

    enc_p = G1_JNP.encode(pts)
    slab_rows = np.zeros((n, r, 16), np.uint32)
    for i in range(n):
        for ri in range(r):
            q = addends[i][ri].neg() if neg_row[i][ri] else addends[i][ri]
            if vmask_bits[i][ri]:
                slab_rows[i, ri] = np.asarray(
                    G1_JNP.pack_affine(G1_JNP.encode([q])[:, :2])
                )[0]
            # invalid slots stay zero rows, like the sorted scheme's pad
    vmask = jnp.asarray(
        (vmask_bits.astype(np.uint32) << np.arange(r, dtype=np.uint32)).sum(axis=1)
    )
    out = P.pmadd_slab_pallas_auto(
        FQ, enc_p, jnp.asarray(slab_rows), vmask, tile=TILE
    )
    dec = G1_JNP.decode(np.asarray(out))
    for i in range(n):
        exp = pts[i]
        for ri in range(r):
            if vmask_bits[i][ri]:
                q = addends[i][ri].neg() if neg_row[i][ri] else addends[i][ri]
                exp = exp.add(q)
        assert dec[i].to_bytes() == exp.to_bytes(), i


@slow
def test_pxyzz_slab_pallas_parity():
    """Parity for the xyzz MSM slab kernel (the fast bucket-add path).

    Exercises every select arm: fresh accumulator (ZZ == 0), normal adds,
    pre-negated rows, masked rows, exact cancellation P + (-P) -> identity,
    and the equal-point poison flag.  Oracle: host bignum adds.
    """
    rng = np.random.default_rng(41)
    g = G1.generator()
    n, r = 32, 4
    acc_pts = [g.mul(1000 + 3 * i) for i in range(n)]
    fresh_lanes = {4, 9}
    addends = [[g.mul(17 * i + 5 * ri + 2) for ri in range(r)] for i in range(n)]
    addends[6][1] = acc_pts[6].add(addends[6][0])  # cancels after row 0 lands
    neg_row = rng.integers(0, 2, size=(n, r)).astype(bool)
    neg_row[6][0] = False
    neg_row[6][1] = True  # acc + row0 then + (-(acc + row0)) -> identity
    vmask_bits = rng.integers(0, 2, size=(n, r)).astype(bool)
    vmask_bits[3] = False
    vmask_bits[6] = True
    poison_lanes = {11}
    addends[11][2] = None  # filled below: equals acc after rows 0..1
    neg_row[11][2] = False
    vmask_bits[11][2] = True

    # encode xyzz accumulators: fresh lanes all-zero, others (x, y, 1, 1)
    acc = np.zeros((n, 4, 16), np.uint32)
    for i, pt in enumerate(acc_pts):
        if i in fresh_lanes:
            continue
        enc = np.asarray(G1_JNP.encode([pt]))[0]
        acc[i, 0] = enc[0]
        acc[i, 1] = enc[1]
        acc[i, 2] = enc[2]  # Z == 1 in Montgomery form == ZZ
        acc[i, 3] = enc[2]

    # expected accumulation on host (also resolves the poison-lane addend)
    expected = []
    poison_expect = np.zeros(n, bool)
    for i in range(n):
        cur = G1.identity() if i in fresh_lanes else acc_pts[i]
        for ri in range(r):
            if not vmask_bits[i][ri]:
                continue
            if i in poison_lanes and ri == 2:
                addends[i][ri] = cur  # equal-point add -> poison, acc kept
                poison_expect[i] = True
                continue
            q = addends[i][ri].neg() if neg_row[i][ri] else addends[i][ri]
            cur = cur.add(q)
        expected.append(cur)

    slab_rows = np.zeros((n, r, 16), np.uint32)
    for i in range(n):
        for ri in range(r):
            if vmask_bits[i][ri]:
                q = addends[i][ri].neg() if neg_row[i][ri] else addends[i][ri]
                slab_rows[i, ri] = np.asarray(
                    G1_JNP.pack_affine(G1_JNP.encode([q])[:, :2])
                )[0]
    vmask = jnp.asarray(
        (vmask_bits.astype(np.uint32) << np.arange(r, dtype=np.uint32)).sum(axis=1)
    )
    pflags = jnp.zeros((n,), jnp.uint32)
    out, flags = P.pxyzz_slab_pallas_auto(
        FQ, jnp.asarray(acc), jnp.asarray(slab_rows), vmask, pflags, tile=TILE
    )
    flags = np.asarray(flags)
    dec = G1_JNP.decode(np.asarray(G1_JNP.xyzz_to_projective(out)))
    for i in range(n):
        assert bool(flags[i]) == bool(poison_expect[i]), f"flag {i}"
        assert dec[i].to_bytes() == expected[i].to_bytes(), i


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(5)
    xy = jnp.asarray(rng.integers(0, 1 << 16, size=(8, 2, 16), dtype=np.uint32))
    assert (G1_JNP.unpack_affine(G1_JNP.pack_affine(xy)) == xy).all()


@slow
def test_pmadd_pallas_parity():
    g = G1.generator()
    pts = [g.mul(i + 2) for i in range(32)]
    qts = [g.mul(3 * i + 5) for i in range(32)]
    # edge cases: P + (-P) = identity, P + P = double, identity accumulator
    qts[3] = pts[3].neg()
    qts[4] = pts[4]
    pts[6] = G1.identity()
    enc_p = G1_JNP.encode(pts)
    enc_q = G1_JNP.encode(qts)[:, :2]
    flags = np.zeros((32,), np.uint32)
    flags[5] = 1  # negate Q
    flags[7] = 2  # skip (keep P)
    out = P.pmadd_pallas_auto(FQ, enc_p, jnp.asarray(enc_q), jnp.asarray(flags), tile=TILE)
    dec = G1_JNP.decode(np.asarray(out))
    for i, (pt, qt) in enumerate(zip(pts, qts)):
        if flags[i] == 1:
            exp = pt.add(qt.neg())
        elif flags[i] == 2:
            exp = pt
        else:
            exp = pt.add(qt)
        assert dec[i].to_bytes() == exp.to_bytes(), i


@slow
def test_affine_step_hierarchical_batchinv_parity(monkeypatch):
    """paffine_step_pallas_auto with OUTER Montgomery-trick tree levels
    (BATCHINV_MAX_M smaller than the chain-product count) must match the jnp
    affine_step reference bit-for-bit mod p on every occupied lane."""
    monkeypatch.setattr(P, "BATCHINV_MAX_M", 256)  # forces 2 outer levels
    monkeypatch.setattr(P, "AFFINE_G", 2)
    f = G1_JNP.f
    n, t = 1024, 512
    rng = np.random.default_rng(5)
    vals = [int(rng.integers(0, 2**60)) % f.p for _ in range(2 * n)]
    ax = f.encode(vals[:n])
    ay = f.encode(vals[n:])
    g = G1.generator()
    pts = G1_JNP.encode([g.mul(i + 2) for i in range(n)])
    rows = G1_JNP.pack_affine(pts[:, :2])
    occ = jnp.asarray((rng.random((n,)) < 0.8).astype(np.uint32))
    vm = jnp.ones((n,), jnp.uint32)
    pf = jnp.zeros((n,), jnp.uint32)
    axo, ayo, occo, pfo = P.paffine_step_pallas_auto(
        f, ax, ay, occ.reshape(n, 1), rows, vm.reshape(n, 1), pf.reshape(n, 1), tile=t
    )
    want = G1_JNP.affine_step(ax, ay, occ, rows, vm > 0, pf)  # jnp branch
    got_occ = np.asarray(occo).reshape(-1)
    assert (got_occ == np.asarray(want[2]).reshape(-1)).all()
    m = got_occ > 0
    assert f.decode(jnp.asarray(np.asarray(axo)[m])) == f.decode(
        jnp.asarray(np.asarray(want[0])[m])
    )
    assert f.decode(jnp.asarray(np.asarray(ayo)[m])) == f.decode(
        jnp.asarray(np.asarray(want[1])[m])
    )
