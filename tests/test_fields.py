"""Field kernels vs exact Python-int arithmetic (the bit-exactness oracle)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkapps_tpu.fields import FQ, FR, Fq, Fr, N_LIMBS

random.seed(1234)


def rand_elems(field, n):
    return [random.randrange(field.p) for _ in range(n)]


@pytest.mark.parametrize("jf,hf", [(FQ, Fq), (FR, Fr)], ids=["Fq", "Fr"])
class TestLimbField:
    def test_encode_decode_roundtrip(self, jf, hf):
        xs = rand_elems(hf, 32) + [0, 1, hf.p - 1]
        arr = jf.encode(xs)
        assert arr.shape == (len(xs), N_LIMBS)
        assert jf.decode(arr) == xs
        arr_std = jf.encode(xs, mont=False)
        assert jf.decode(arr_std, mont=False) == xs

    def test_mul(self, jf, hf):
        n = 64
        xs, ys = rand_elems(hf, n), rand_elems(hf, n)
        # Edge cases.
        xs[:4] = [0, 1, hf.p - 1, hf.p - 1]
        ys[:4] = [0, hf.p - 1, hf.p - 1, 1]
        a, b = jf.encode(xs), jf.encode(ys)
        out = jax.jit(jf.mul)(a, b)
        assert jf.decode(out) == [x * y % hf.p for x, y in zip(xs, ys)]

    def test_add_sub_neg(self, jf, hf):
        n = 64
        xs, ys = rand_elems(hf, n), rand_elems(hf, n)
        xs[:3] = [0, hf.p - 1, hf.p - 1]
        ys[:3] = [0, 1, hf.p - 1]
        a, b = jf.encode(xs), jf.encode(ys)
        assert jf.decode(jax.jit(jf.add)(a, b)) == [(x + y) % hf.p for x, y in zip(xs, ys)]
        assert jf.decode(jax.jit(jf.sub)(a, b)) == [(x - y) % hf.p for x, y in zip(xs, ys)]
        assert jf.decode(jax.jit(jf.neg)(a)) == [(-x) % hf.p for x in xs]

    def test_mont_roundtrip(self, jf, hf):
        xs = rand_elems(hf, 16)
        std = jf.encode(xs, mont=False)
        mont = jax.jit(jf.to_mont)(std)
        assert jf.decode(mont) == xs
        back = jax.jit(jf.from_mont)(mont)
        assert jf.decode(back, mont=False) == xs

    def test_inv(self, jf, hf):
        xs = rand_elems(hf, 8) + [1, hf.p - 1]
        a = jf.encode(xs)
        out = jax.jit(jf.inv)(a)
        assert jf.decode(out) == [hf.inv(x) for x in xs]

    def test_inv_zero_is_zero(self, jf, hf):
        a = jf.encode([0, 5])
        out = jax.jit(jf.inv)(a)
        assert jf.decode(out)[0] == 0

    def test_batch_inv(self, jf, hf):
        xs = rand_elems(hf, 33)
        xs[7] = 0  # zero entry must map to zero
        a = jf.encode(xs)
        out = jax.jit(jf.batch_inv)(a)
        expect = [hf.inv(x) if x else 0 for x in xs]
        assert jf.decode(out) == expect

    def test_pow_const(self, jf, hf):
        xs = rand_elems(hf, 4)
        a = jf.encode(xs)
        e = 0xDEADBEEFCAFE
        out = jax.jit(lambda v: jf.pow_const(v, e))(a)
        assert jf.decode(out) == [pow(x, e, hf.p) for x in xs]

    def test_predicates(self, jf, hf):
        xs = [0, 1, 5, hf.p - 1]
        a = jf.encode(xs)
        assert list(np.asarray(jf.is_zero(a))) == [True, False, False, False]
        assert list(np.asarray(jf.eq(a, a))) == [True] * 4

    def test_mul_small(self, jf, hf):
        xs = rand_elems(hf, 8)
        a = jf.encode(xs)
        for k in [1, 2, 3, 8, 29]:
            out = jax.jit(lambda v, k=k: jf.mul_small(v, k))(a)
            assert jf.decode(out) == [x * k % hf.p for x in xs]


def test_unrolled_matches_looped():
    """The two graph-shape modes must be bit-identical."""
    from zkapps_tpu.fields.jnp_ops import get_unroll, set_unroll

    xs = rand_elems(Fr, 16)
    ys = rand_elems(Fr, 16)
    a, b = FR.encode(xs), FR.encode(ys)
    prev = get_unroll()
    try:
        set_unroll(True)
        m_u = jax.jit(lambda u, v: FR.mul(u, v))(a, b)
        a_u = jax.jit(lambda u, v: FR.add(u, v))(a, b)
        s_u = jax.jit(lambda u, v: FR.sub(u, v))(a, b)
        set_unroll(False)
        m_l = jax.jit(lambda u, v: FR.mul(u, v))(a, b)
        a_l = jax.jit(lambda u, v: FR.add(u, v))(a, b)
        s_l = jax.jit(lambda u, v: FR.sub(u, v))(a, b)
    finally:
        set_unroll(prev)
    assert np.array_equal(np.asarray(m_u), np.asarray(m_l))
    assert np.array_equal(np.asarray(a_u), np.asarray(a_l))
    assert np.array_equal(np.asarray(s_u), np.asarray(s_l))
    assert FR.decode(m_u) == [x * y % Fr.p for x, y in zip(xs, ys)]


def test_host_field_basics():
    assert Fr.inv(Fr.mul(12345, Fr.inv(12345))) == Fr.inv(1)
    w = Fr.root_of_unity(3)
    assert pow(w, 8, Fr.p) == 1 and pow(w, 4, Fr.p) != 1
    # sqrt
    x = 123456789
    s = Fq.sqrt(Fq.mul(x, x))
    assert s in (x % Fq.p, (-x) % Fq.p)
    # serialization round trip
    assert Fr.from_bytes(Fr.to_bytes(x)) == x
