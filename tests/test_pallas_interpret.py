"""Pallas kernel parity on CPU via interpret mode.

The Mosaic kernels (fields/pallas_ops.py) are the TPU hot path for the MSM
bucket loop; nothing else in the CPU suite executes them.  Interpret mode
runs the same kernel python against the same block layout as de-sugared jax
ops, so kernel-logic regressions (limb bounds, carry resolution, masking)
are caught without a TPU.

Oracle: the exact host bignum implementation (fields/host.py, curve/host.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.fields import pallas_ops as P
from zkapps_tpu.fields.host import Fq
from zkapps_tpu.fields.jnp_ops import FQ

TILE = 128


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


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(5)
    xy = jnp.asarray(rng.integers(0, 1 << 16, size=(8, 2, 16), dtype=np.uint32))
    assert (G1_JNP.unpack_affine(G1_JNP.pack_affine(xy)) == xy).all()


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
