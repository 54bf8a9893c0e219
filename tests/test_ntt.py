"""NTT: device vs host recursion vs naive polynomial evaluation."""

import random

import jax

from zkapps_tpu.fields import FR, Fr
from zkapps_tpu.ntt import get_plan, naive_eval, ntt_host, powers_device

random.seed(11)


def test_host_ntt_matches_naive_eval():
    log_n = 4
    n = 1 << log_n
    coeffs = [random.randrange(Fr.p) for _ in range(n)]
    omega = Fr.root_of_unity(log_n)
    points = [pow(omega, i, Fr.p) for i in range(n)]
    assert ntt_host(coeffs) == naive_eval(coeffs, points)


def test_host_roundtrip():
    coeffs = [random.randrange(Fr.p) for _ in range(32)]
    assert ntt_host(ntt_host(coeffs), inverse=True) == coeffs


def test_powers_device():
    x = 12345
    pows = powers_device(FR, FR.encode_scalar(x), 11)
    assert FR.decode(pows) == [pow(x, i, Fr.p) for i in range(11)]


def test_device_forward_matches_host():
    for log_n in (1, 4, 6):
        n = 1 << log_n
        coeffs = [random.randrange(Fr.p) for _ in range(n)]
        plan = get_plan(log_n)
        out = jax.jit(plan.forward)(FR.encode(coeffs))
        assert FR.decode(out) == ntt_host(coeffs), f"log_n={log_n}"


def test_device_roundtrip():
    log_n = 6
    n = 1 << log_n
    coeffs = [random.randrange(Fr.p) for _ in range(n)]
    plan = get_plan(log_n)
    arr = FR.encode(coeffs)
    back = jax.jit(plan.inverse)(jax.jit(plan.forward)(arr))
    assert FR.decode(back) == coeffs


def test_device_coset():
    log_n = 5
    n = 1 << log_n
    coeffs = [random.randrange(Fr.p) for _ in range(n)]
    plan = get_plan(log_n)
    out = jax.jit(plan.coset_forward)(FR.encode(coeffs))
    omega, g = plan.omega, plan.coset_gen
    points = [g * pow(omega, i, Fr.p) % Fr.p for i in range(n)]
    assert FR.decode(out) == naive_eval(coeffs, points)
    back = jax.jit(plan.coset_inverse)(out)
    assert FR.decode(back) == coeffs
