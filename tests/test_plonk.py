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


def test_proof_is_deterministic_and_binds_publics(setup):
    srs, pk = setup
    ctx = build_cubic(3)
    p1 = prove(pk, ctx)
    p2 = prove(pk, ctx)
    assert p1 == p2  # no blinding yet (documented; ZK blinding is round-2 work)
