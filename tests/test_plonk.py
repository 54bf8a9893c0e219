"""PLONK prove+verify end-to-end on small circuits (CPU-runnable)."""

import random

import pytest

from zkapps_tpu.circuit import Context, GateChip
from zkapps_tpu.fields import Fr
from zkapps_tpu.pcs import get_srs
from zkapps_tpu.plonk import check_circuit, keygen, prove, verify

random.seed(123)
P = Fr.p


def build_cubic(x: int, extra_pub: int | None = None) -> Context:
    """Toy relation: prove knowledge of x with x^3 + x + 5 == pub."""
    ctx = Context()
    g = GateChip(ctx)
    xc = ctx.load_witness(x)
    x2 = g.mul(xc, xc)
    x3 = g.mul(x2, xc)
    out = g.add_const(g.add(x3, xc), 5)
    ctx.make_public(out)
    if extra_pub is not None:
        ctx.make_public(ctx.load_witness(extra_pub))
    return ctx


@pytest.fixture(scope="module")
def setup():
    srs = get_srs(8)  # domain up to 2^6 circuit + coset margin
    ctx = build_cubic(3)
    check_circuit(ctx)
    pk = keygen(ctx, srs)
    return srs, pk


def publics_of(ctx):
    return [ctx.advice[c] % P for c in ctx.publics]


def test_prove_verify_roundtrip(setup):
    srs, pk = setup
    ctx = build_cubic(3)
    proof = prove(pk, ctx, debug_checks=True)
    assert verify(pk.vk, pk.kzg, proof, publics_of(ctx))
    # halo2-matching strictness: the transcript must consume the stream
    # exactly — appended junk is proof malleability, rejected.
    assert not verify(pk.vk, pk.kzg, proof + b"junk", publics_of(ctx))
    assert not verify(pk.vk, pk.kzg, proof + b"\x00", publics_of(ctx))


def test_same_layout_different_witness(setup):
    srs, pk = setup
    ctx = build_cubic(12345)
    proof = prove(pk, ctx, debug_checks=True)
    assert verify(pk.vk, pk.kzg, proof, publics_of(ctx))


def test_wrong_public_rejected(setup):
    srs, pk = setup
    ctx = build_cubic(3)
    proof = prove(pk, ctx)
    good = publics_of(ctx)
    assert not verify(pk.vk, pk.kzg, proof, [(good[0] + 1) % P])


def test_tampered_proof_rejected(setup):
    srs, pk = setup
    ctx = build_cubic(3)
    proof = bytearray(prove(pk, ctx))
    proof[40] ^= 0x01
    assert not verify(pk.vk, pk.kzg, bytes(proof), publics_of(ctx))


def test_truncated_proof_rejected(setup):
    srs, pk = setup
    ctx = build_cubic(3)
    proof = prove(pk, ctx)
    assert not verify(pk.vk, pk.kzg, proof[:-32], publics_of(ctx))


def test_seeded_proofs_deterministic(setup):
    srs, pk = setup
    ctx = build_cubic(3)
    p1 = prove(pk, ctx, rng=random.Random(7))
    p2 = prove(pk, ctx, rng=random.Random(7))
    assert p1 == p2


def test_blinding_hides_witness(setup):
    """Same statement, fresh randomness -> different proof bytes, both valid.

    (The reference's halo2 stack is zero-knowledge via random trailing rows;
    this backend blinds with Z_H multiples — prover.py docstring.)"""
    srs, pk = setup
    ctx = build_cubic(3)
    p1 = prove(pk, ctx, rng=random.Random(1))
    p2 = prove(pk, ctx, rng=random.Random(2))
    assert p1 != p2
    assert verify(pk.vk, pk.kzg, p1, publics_of(ctx))
    assert verify(pk.vk, pk.kzg, p2, publics_of(ctx))


def test_default_rng_is_nondeterministic(setup):
    srs, pk = setup
    ctx = build_cubic(3)
    assert prove(pk, ctx) != prove(pk, ctx)


def test_shplonk_roundtrip(setup):
    srs, _ = setup
    ctx = build_cubic(3)
    pk = keygen(ctx, srs, multiopen="shplonk")
    proof = prove(pk, ctx, debug_checks=True)
    assert verify(pk.vk, pk.kzg, proof, publics_of(ctx))
    # SHPLONK costs 2 proof points for the multiopen vs GWC's 4
    assert not verify(pk.vk, pk.kzg, proof, [(publics_of(ctx)[0] + 1) % P])


def build_poseidon_circuit(x: int, y: int):
    """Hash two witnesses with the degree-6 Poseidon custom gate (one
    permutation: 65 p-rows) and expose the digest."""
    from zkapps_tpu.circuit import PoseidonGadget
    from zkapps_tpu.hash import hash_host

    ctx = Context(poseidon_gate=True)
    g = GateChip(ctx)
    pos = PoseidonGadget(ctx, g)
    w1, w2 = ctx.load_witness(x), ctx.load_witness(y)
    out = pos.hash_fix_len_array([w1, w2])
    assert out.value == hash_host([x, y])
    ctx.make_public(out)
    return ctx


def test_poseidon_gate_prove_verify():
    srs = get_srs(9)
    ctx = build_poseidon_circuit(111, 222)
    check_circuit(ctx)
    pk = keygen(ctx, srs)
    assert pk.vk.poseidon and pk.n == 128
    proof = prove(pk, ctx, debug_checks=True, rng=random.Random(9))
    assert verify(pk.vk, pk.kzg, proof, publics_of(ctx))
    assert not verify(pk.vk, pk.kzg, proof, [(publics_of(ctx)[0] + 1) % P])
    # same layout, different witness reuses the pk
    ctx2 = build_poseidon_circuit(7, 8)
    proof2 = prove(pk, ctx2, rng=random.Random(10))
    assert verify(pk.vk, pk.kzg, proof2, publics_of(ctx2))
    assert not verify(pk.vk, pk.kzg, proof2, publics_of(ctx))


def test_shplonk_tamper_rejected(setup):
    srs, _ = setup
    ctx = build_cubic(3)
    pk = keygen(ctx, srs, multiopen="shplonk")
    proof = bytearray(prove(pk, ctx))
    proof[-1] ^= 0x40
    assert not verify(pk.vk, pk.kzg, bytes(proof), publics_of(ctx))


def test_prove_verify_roundtrip_ipa():
    """PLONK over the IPA commitment scheme (keygen pcs='ipa') — the
    reference's halo2_proofs poly/ipa backend analog."""
    ctx = build_cubic(3)
    check_circuit(ctx)
    pk = keygen(ctx, None, pcs="ipa")
    proof = prove(pk, ctx, debug_checks=True)
    pubs = publics_of(ctx)
    assert verify(pk.vk, pk.kzg, proof, pubs)
    assert not verify(pk.vk, pk.kzg, proof, [(pubs[0] + 1) % P])
    assert not verify(pk.vk, pk.kzg, proof + b"junk", pubs)
    tampered = bytearray(proof)
    tampered[40] ^= 1
    assert not verify(pk.vk, pk.kzg, bytes(tampered), pubs)
