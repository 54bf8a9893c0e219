"""IPA commitment scheme: open/verify roundtrip, blinding, multiopen,
negative paths.

Reference capability: halo2_proofs poly/ipa (SURVEY.md §2.2 X2 — the non-KZG
commitment scheme; NOTES.md fast-path 9).
"""

import random

import pytest

from zkapps_tpu.curve.host import G1
from zkapps_tpu.fields.host import Fr
from zkapps_tpu.fields.jnp_ops import FR
from zkapps_tpu.pcs.ipa import IPA, ipa_setup
from zkapps_tpu.transcript.blake2b import Blake2bRead, Blake2bWrite

LOG_N = 5
N = 1 << LOG_N


@pytest.fixture(scope="module")
def ipa():
    return IPA(ipa_setup(LOG_N))


def _poly(rng, length=N):
    return FR.encode([rng.randrange(Fr.p) for _ in range(length)])


def _eval(coeffs, z):
    acc = 0
    for c in reversed(FR.decode(coeffs)):
        acc = (acc * z + c) % Fr.p
    return acc


def test_setup_points_on_curve(ipa):
    for pt in ipa.params.g_host[:4] + [ipa.params.w, ipa.params.u]:
        assert pt.is_on_curve()
    # basis points pairwise distinct
    xs = {pt.x for pt in ipa.params.g_host}
    assert len(xs) == N


def test_open_verify_roundtrip(ipa):
    rng = random.Random(1)
    poly = _poly(rng)
    z = rng.randrange(Fr.p)
    c = ipa.commit(poly)

    tw = Blake2bWrite()
    tw.common_point(c)
    v = ipa.open(tw, poly, z)
    assert v == _eval(poly, z)
    proof = tw.finalize()

    tr = Blake2bRead(proof)
    tr.common_point(c)
    assert ipa.verify(tr, c, z, v)


def test_open_verify_blinded(ipa):
    rng = random.Random(2)
    poly = _poly(rng)
    z = rng.randrange(Fr.p)
    blind = rng.randrange(Fr.p)
    c = ipa.commit(poly, blind=blind)

    tw = Blake2bWrite()
    tw.common_point(c)
    v = ipa.open(tw, poly, z, blind=blind, blind_rng=lambda: rng.randrange(Fr.p))
    tr = Blake2bRead(tw.finalize())
    tr.common_point(c)
    assert ipa.verify(tr, c, z, v)


def test_verify_rejects_wrong_value(ipa):
    rng = random.Random(3)
    poly = _poly(rng)
    z = rng.randrange(Fr.p)
    c = ipa.commit(poly)
    tw = Blake2bWrite()
    tw.common_point(c)
    v = ipa.open(tw, poly, z)
    tr = Blake2bRead(tw.finalize())
    tr.common_point(c)
    assert not ipa.verify(tr, c, z, (v + 1) % Fr.p)


def test_verify_rejects_wrong_commitment(ipa):
    rng = random.Random(4)
    poly = _poly(rng)
    z = rng.randrange(Fr.p)
    c = ipa.commit(poly)
    tw = Blake2bWrite()
    tw.common_point(c)
    v = ipa.open(tw, poly, z)
    tr = Blake2bRead(tw.finalize())
    tr.common_point(c)
    bad = c.add(G1.generator())
    assert not ipa.verify(tr, bad, z, v)


def test_verify_rejects_tampered_proof(ipa):
    rng = random.Random(5)
    poly = _poly(rng)
    z = rng.randrange(Fr.p)
    c = ipa.commit(poly)
    tw = Blake2bWrite()
    tw.common_point(c)
    v = ipa.open(tw, poly, z)
    proof = bytearray(tw.finalize())
    proof[-1] ^= 1  # corrupt the blind scalar
    tr = Blake2bRead(bytes(proof))
    tr.common_point(c)
    assert not ipa.verify(tr, c, z, v)


def test_short_poly_padding(ipa):
    rng = random.Random(6)
    poly = _poly(rng, length=N // 2 + 3)
    z = rng.randrange(Fr.p)
    c = ipa.commit(poly)
    tw = Blake2bWrite()
    tw.common_point(c)
    v = ipa.open(tw, poly, z)
    assert v == _eval(poly, z)
    tr = Blake2bRead(tw.finalize())
    tr.common_point(c)
    assert ipa.verify(tr, c, z, v)


def test_multiopen(ipa):
    rng = random.Random(7)
    polys = [_poly(rng) for _ in range(3)]
    z1, z2 = rng.randrange(Fr.p), rng.randrange(Fr.p)
    comms = [ipa.commit(pl) for pl in polys]
    # polys 0,1 opened at z1; polys 1,2 at z2
    queries = [
        (z1, [(0, _eval(polys[0], z1)), (1, _eval(polys[1], z1))]),
        (z2, [(1, _eval(polys[1], z2)), (2, _eval(polys[2], z2))]),
    ]
    tw = Blake2bWrite()
    for cm in comms:
        tw.common_point(cm)
    ipa.multiopen_prove(tw, polys, queries)
    tr = Blake2bRead(tw.finalize())
    for cm in comms:
        tr.common_point(cm)
    assert ipa.multiopen_verify(tr, comms, queries)


def test_multiopen_rejects_wrong_eval(ipa):
    rng = random.Random(8)
    polys = [_poly(rng) for _ in range(2)]
    z = rng.randrange(Fr.p)
    comms = [ipa.commit(pl) for pl in polys]
    queries = [(z, [(0, _eval(polys[0], z)), (1, _eval(polys[1], z))])]
    tw = Blake2bWrite()
    for cm in comms:
        tw.common_point(cm)
    ipa.multiopen_prove(tw, polys, queries)
    bad = [(z, [(0, (_eval(polys[0], z) + 1) % Fr.p), (1, _eval(polys[1], z))])]
    tr = Blake2bRead(tw.finalize())
    for cm in comms:
        tr.common_point(cm)
    assert not ipa.multiopen_verify(tr, comms, bad)
