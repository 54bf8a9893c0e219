"""Lookup argument (logUp) — prove/verify, range checks, negative paths.

The reference's halo2_proofs ships halo2's permuted-column lookup argument
(SURVEY.md §2.2 X2, NOTES.md fast-path 8); this backend provides the same
constraint-system capability via the log-derivative (logUp) formulation:
multiplicity column + running sum + batched inversion, which vectorizes on
TPU without sorting.
"""

import random

import pytest

from zkapps_tpu.circuit import Context, GateChip
from zkapps_tpu.fields import Fr
from zkapps_tpu.pcs import get_srs
from zkapps_tpu.plonk import check_circuit, keygen, prove, verify
from zkapps_tpu.plonk.mock import ConstraintFailure

P = Fr.p
LOG_N = 8


@pytest.fixture(scope="module")
def srs():
    return get_srs(LOG_N + 3)  # 8n coset commitment headroom


def build_range_circuit(values, bits=6):
    ctx = Context()
    gate = GateChip(ctx)
    cells = []
    for v in values:
        cell = ctx.load_witness(v)
        gate.range_check(cell, bits)
        cells.append(cell)
    # a small arithmetic statement on top: sum is public
    acc = cells[0]
    for c in cells[1:]:
        acc = gate.add(acc, c)
    ctx.make_public(acc)
    return ctx, acc.value


def test_mock_accepts_in_range():
    ctx, _ = build_range_circuit([0, 1, 17, 63, 63, 5])
    check_circuit(ctx)


def test_mock_rejects_out_of_range():
    ctx, _ = build_range_circuit([0, 1, 64])
    with pytest.raises(ConstraintFailure):
        check_circuit(ctx)


def test_lookup_prove_verify_roundtrip(srs):
    random.seed(13)
    vals = [random.randrange(64) for _ in range(10)]
    ctx, total = build_range_circuit(vals)
    pk = keygen(ctx, srs, log_n=LOG_N)
    assert pk.vk.lookups == ("range_6",)
    proof = prove(pk, ctx, debug_checks=True, rng=random.Random(7))
    assert verify(pk.vk, pk.kzg, proof, [total])
    # wrong public input rejects
    assert not verify(pk.vk, pk.kzg, proof, [(total + 1) % P])
    # flipped byte rejects
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not verify(pk.vk, pk.kzg, bytes(bad), [total])


def test_lookup_out_of_table_prover_fails(srs):
    ctx, total = build_range_circuit([3, 70])  # 70 not in [0, 64)
    pk = keygen(ctx, srs, log_n=LOG_N)
    with pytest.raises(AssertionError):
        prove(pk, ctx, debug_checks=True, rng=random.Random(7))


def test_forged_lookup_witness_rejected(srs):
    """Tamper the witness after keygen: out-of-range value, multiplicities
    forged to keep the running sum consistent -> quotient identity must fail
    (the prover's own debug check catches it before emitting a proof)."""
    vals = [1, 2, 3, 4]
    ctx, total = build_range_circuit(vals)
    pk = keygen(ctx, srs, log_n=LOG_N)
    # out-of-range replacement of a looked-up cell (advice only; the copy
    # constraints and lookup both break)
    bad_cell = ctx.lookup_cells["range_6"][0]
    ctx.advice[bad_cell] = 64
    with pytest.raises(AssertionError):
        prove(pk, ctx, debug_checks=True, rng=random.Random(7))


def test_range_check_decomposed(srs):
    ctx = Context()
    gate = GateChip(ctx)
    v = 0x2A5F  # 14 bits
    cell = ctx.load_witness(v)
    gate.range_check_decomposed(cell, 18, 6)
    ctx.make_public(cell)
    check_circuit(ctx)
    pk = keygen(ctx, srs, log_n=LOG_N)
    proof = prove(pk, ctx, debug_checks=True, rng=random.Random(9))
    assert verify(pk.vk, pk.kzg, proof, [v])


def test_two_tables(srs):
    ctx = Context()
    gate = GateChip(ctx)
    a = ctx.load_witness(40)
    b = ctx.load_witness(3)
    gate.range_check(a, 6)
    gate.range_check(b, 2)
    out = gate.add(a, b)
    ctx.make_public(out)
    pk = keygen(ctx, srs, log_n=LOG_N)
    assert pk.vk.lookups == ("range_2", "range_6")
    proof = prove(pk, ctx, debug_checks=True, rng=random.Random(3))
    assert verify(pk.vk, pk.kzg, proof, [43])
