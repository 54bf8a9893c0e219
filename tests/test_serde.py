"""Serialization round-trips: G1/G2 compressed points, SRS files.

Covers the production SRS path (ceremony load via SRS.from_arrays and disk
round-trip via SRS.save/load) — reference behavior: halo2_proofs ParamsKZG
read/write (SURVEY.md §3.5 "SRS load") and halo2curves compressed serde.
"""

import pytest

from zkapps_tpu.curve.host import G1, G2
from zkapps_tpu.curve.jnp_point import G1_JNP


def test_g1_roundtrip():
    pts = [G1.generator().mul(k) for k in (1, 2, 3, 7, 123456789)]
    pts.append(G1.identity())
    for pt in pts:
        enc = pt.to_bytes()
        assert len(enc) == 32
        assert G1.from_bytes(enc) == pt


def test_g2_roundtrip():
    pts = [G2.generator().mul(k) for k in (1, 2, 3, 987654321)]
    pts.append(G2.identity())
    for pt in pts:
        enc = pt.to_bytes()
        assert len(enc) == 64
        back = G2.from_bytes(enc)
        assert back == pt


def test_g2_negated_distinct_encoding():
    g = G2.generator()
    assert g.to_bytes() != g.neg().to_bytes()
    assert G2.from_bytes(g.neg().to_bytes()) == g.neg()


def test_g2_invalid_encoding_rejected():
    from zkapps_tpu.fields.host import FQ_MODULUS

    bad = bytearray(64)
    bad[:32] = FQ_MODULUS.to_bytes(32, "little")  # x.c0 = p: out of range
    with pytest.raises(ValueError):
        G2.from_bytes(bytes(bad))
    with pytest.raises(ValueError):
        G2.from_bytes(b"\x00" * 10)  # wrong length


def test_srs_from_arrays_and_disk_roundtrip(tmp_path):
    from zkapps_tpu.pcs.srs import SRS, setup

    srs = setup(4, seed=b"serde-test")
    path = tmp_path / "srs.bin"
    srs.save(path)
    loaded = SRS.load(path)
    assert loaded.n == srs.n
    assert loaded.secret is None  # production load carries no secret
    assert loaded.g2 == srs.g2 and loaded.s_g2 == srs.s_g2
    assert G1_JNP.decode(loaded.g1_powers) == G1_JNP.decode(srs.g1_powers)


def test_srs_from_arrays_validates():
    from zkapps_tpu.pcs.srs import SRS

    g = G1.generator()
    with pytest.raises(ValueError):
        SRS.from_arrays([], G2.generator(), G2.generator())
    with pytest.raises(ValueError):
        # first power must be the generator
        SRS.from_arrays([g.mul(2), g], G2.generator(), G2.generator())


def test_transcript_rejects_identity():
    from zkapps_tpu.transcript.blake2b import Blake2bRead, Blake2bWrite

    tr = Blake2bWrite()
    with pytest.raises(ValueError):
        tr.common_point(G1.identity())
    rd = Blake2bRead(b"\x00" * 32)
    with pytest.raises(ValueError):
        rd.read_point()
