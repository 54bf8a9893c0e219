"""Curve ops: host group laws, serialization, device complete formulas."""

import random

import jax
import jax.numpy as jnp

from zkapps_tpu.curve import G1, G2, G1_JNP
from zkapps_tpu.fields import Fr

random.seed(99)
G = G1.generator()


def rand_points(n):
    return [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]


def test_host_group_law():
    assert G.is_on_curve()
    a, b = G.mul(5), G.mul(7)
    assert a.add(b) == G.mul(12)
    assert a.add(a) == G.mul(10)
    assert a.add(a.neg()).is_identity
    assert G.mul(Fr.p).is_identity  # group order
    assert G.add(G1.identity()) == G


def test_host_serialization():
    for pt in rand_points(8) + [G1.identity(), G]:
        assert G1.from_bytes(pt.to_bytes()) == pt


def test_g2_host():
    g2 = G2.generator()
    assert g2.is_on_curve()
    assert g2.mul(Fr.p).is_identity
    a = g2.mul(11)
    assert g2.mul(5).add(g2.mul(6)) == a
    assert a.add(a.neg()).is_identity


def test_device_add_matches_host():
    n = 8
    ps, qs = rand_points(n), rand_points(n)
    # exercise the complete-formula edge cases
    ps[0], qs[0] = G, G  # P + P (doubling through add)
    ps[1], qs[1] = G, G.neg()  # P + (-P) = identity
    ps[2] = G1.identity()  # 0 + Q
    qs[3] = G1.identity()  # P + 0
    pa, qa = G1_JNP.encode(ps), G1_JNP.encode(qs)
    out = jax.jit(G1_JNP.add)(pa, qa)
    assert G1_JNP.decode(out) == [p.add(q) for p, q in zip(ps, qs)]


def test_device_double_matches_host():
    ps = rand_points(4) + [G1.identity()]
    pa = G1_JNP.encode(ps)
    out = jax.jit(G1_JNP.double)(pa)
    assert G1_JNP.decode(out) == [p.double() for p in ps]


def test_device_identity_neg_eq():
    ps = rand_points(3)
    pa = G1_JNP.encode(ps)
    ident = G1_JNP.identity_like((3,))
    out = jax.jit(G1_JNP.add)(pa, ident)
    assert G1_JNP.decode(out) == ps
    assert bool(jnp.all(G1_JNP.is_identity(ident)))
    assert not bool(jnp.any(G1_JNP.is_identity(pa)))
    negs = G1_JNP.neg(pa)
    assert G1_JNP.decode(negs) == [p.neg() for p in ps]
    # eq across different Z scalings: add identity → different projective rep
    assert bool(jnp.all(G1_JNP.eq(out, pa)))


def test_device_to_affine():
    ps = rand_points(3) + [G1.identity()]
    pa = G1_JNP.encode(ps)
    doubled = jax.jit(G1_JNP.double)(pa)  # non-trivial Z
    aff = jax.jit(G1_JNP.to_affine)(doubled)
    want = [p.double() for p in ps]
    xs = G1_JNP.f.decode(aff[:, 0])
    ys = G1_JNP.f.decode(aff[:, 1])
    for (x, y), w in zip(zip(xs, ys), want):
        if w.is_identity:
            assert (x, y) == (0, 0)
        else:
            assert (x, y) == (w.x, w.y)


def test_distinct_generator_multiples():
    """Device-generated m_i*G (bench input path) matches host scalar muls."""
    from zkapps_tpu.curve.jnp_point import distinct_generator_multiples

    pts, mults = distinct_generator_multiples(16, seed=3, bits=32)
    assert len(set(int(m) for m in mults)) == 16  # distinct whp at 32 bits
    dec = G1_JNP.decode(pts)
    g = G1.generator()
    for pt, m in zip(dec, mults):
        assert pt.to_bytes() == g.mul(int(m)).to_bytes()
    # normalized encoding: Z in {0, 1} (mixed-add kernel requirement)
    zs = G1_JNP.f.decode(pts[:, 2])
    assert set(zs) <= {0, 1}
