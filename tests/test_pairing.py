"""Pairing: bilinearity, non-degeneracy, product check."""

import pytest

from zkapps_tpu.curve import G1, G2
from zkapps_tpu.pairing import FQ12_ONE, pairing, pairing_check
from zkapps_tpu.pairing.bn254_pairing import f12_mul, f12_pow


@pytest.fixture(scope="module")
def base_pairing():
    return pairing(G1.generator(), G2.generator())


def test_non_degenerate(base_pairing):
    assert base_pairing != FQ12_ONE


def test_bilinearity_left(base_pairing):
    e2 = pairing(G1.generator().mul(2), G2.generator())
    assert e2 == f12_mul(base_pairing, base_pairing)


def test_bilinearity_right(base_pairing):
    e2l = pairing(G1.generator().mul(3), G2.generator())
    e2r = pairing(G1.generator(), G2.generator().mul(3))
    assert e2l == e2r
    assert e2l == f12_pow(base_pairing, 3)


def test_pairing_check_product():
    # e(aG1, bG2) * e(-abG1, G2) == 1
    a, b = 17, 29
    assert pairing_check(
        [
            (G1.generator().mul(a), G2.generator().mul(b)),
            (G1.generator().mul(a * b).neg(), G2.generator()),
        ]
    )
    assert not pairing_check(
        [
            (G1.generator().mul(a), G2.generator().mul(b)),
            (G1.generator().mul(a * b + 1).neg(), G2.generator()),
        ]
    )
