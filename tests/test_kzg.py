"""KZG: SRS structure, commit/open/verify, GWC multiopen, transcript."""

import random

import pytest

from zkapps_tpu.curve import G1, G1_JNP
from zkapps_tpu.fields import FR, Fr
from zkapps_tpu.pcs import KZG, get_srs
from zkapps_tpu.transcript import Blake2bRead, Blake2bWrite

random.seed(55)

LOG_N = 4
N = 1 << LOG_N


@pytest.fixture(scope="module")
def srs():
    return get_srs(LOG_N)


@pytest.fixture(scope="module")
def kzg(srs):
    return KZG(srs, LOG_N)


def poly(coeffs):
    return FR.encode(coeffs + [0] * (N - len(coeffs)))


def host_eval(coeffs, z):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % Fr.p
    return acc


def test_srs_structure(srs):
    pts = G1_JNP.decode(srs.g1_powers)
    assert pts[0] == G1.generator()
    s = srs.secret
    assert pts[1] == G1.generator().mul(s)
    assert pts[5] == G1.generator().mul(pow(s, 5, Fr.p))
    assert srs.s_g2 == srs.g2.mul(s)


def test_commit_matches_direct_eval(srs, kzg):
    coeffs = [random.randrange(Fr.p) for _ in range(N)]
    c = kzg.commit(poly(coeffs))
    # commitment = [f(s)]G1 (dev secret known)
    assert c == G1.generator().mul(host_eval(coeffs, srs.secret))


def test_eval_poly(kzg):
    coeffs = [random.randrange(Fr.p) for _ in range(N)]
    z = random.randrange(Fr.p)
    assert kzg.eval_poly(poly(coeffs), z) == host_eval(coeffs, z)


def test_open_and_verify_single(kzg):
    coeffs = [random.randrange(Fr.p) for _ in range(N)]
    z = random.randrange(Fr.p)
    c = kzg.commit(poly(coeffs))
    y, w = kzg.open_single(poly(coeffs), z)
    assert y == host_eval(coeffs, z)
    assert kzg.verify_single(c, z, y, w)
    assert not kzg.verify_single(c, z, (y + 1) % Fr.p, w)


def test_multiopen_roundtrip(kzg):
    polys = [poly([random.randrange(Fr.p) for _ in range(N)]) for _ in range(3)]
    comms = [kzg.commit(p) for p in polys]
    z1, z2 = random.randrange(Fr.p), random.randrange(Fr.p)
    y = lambda i, z: kzg.eval_poly(polys[i], z)  # noqa: E731
    # polys 0,1 opened at z1; polys 1,2 opened at z2
    queries = [
        (z1, [(0, y(0, z1)), (1, y(1, z1))]),
        (z2, [(1, y(1, z2)), (2, y(2, z2))]),
    ]
    tw = Blake2bWrite()
    for c in comms:
        tw.common_point(c)
    for z, opens in queries:
        for _, yv in opens:
            tw.common_scalar(yv)
    kzg.multiopen_prove(tw, polys, queries)
    proof = tw.finalize()

    tr = Blake2bRead(proof)
    for c in comms:
        tr.common_point(c)
    for z, opens in queries:
        for _, yv in opens:
            tr.common_scalar(yv)
    assert kzg.multiopen_verify(tr, comms, queries)

    # tampered eval must fail
    bad_queries = [
        (z1, [(0, (y(0, z1) + 1) % Fr.p), (1, y(1, z1))]),
        queries[1],
    ]
    tr2 = Blake2bRead(proof)
    for c in comms:
        tr2.common_point(c)
    for z, opens in bad_queries:
        for _, yv in opens:
            tr2.common_scalar(yv)
    assert not kzg.multiopen_verify(tr2, comms, bad_queries)


def test_transcript_prover_verifier_agree():
    tw = Blake2bWrite()
    tw.write_scalar(42)
    g = G1.generator()
    tw.write_point(g.mul(7))
    c1 = tw.squeeze_challenge()
    tw.write_scalar(c1)
    c2 = tw.squeeze_challenge()
    proof = tw.finalize()

    tr = Blake2bRead(proof)
    assert tr.read_scalar() == 42
    assert tr.read_point() == g.mul(7)
    assert tr.squeeze_challenge() == c1
    assert tr.read_scalar() == c1
    assert tr.squeeze_challenge() == c2
    tr.assert_consumed()
