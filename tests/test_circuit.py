"""Circuit frontend: gate semantics + mock-prover constraint checking."""

import random

import pytest

from zkapps_tpu.circuit import Context, GateChip, PoseidonGadget
from zkapps_tpu.fields import Fr
from zkapps_tpu.hash import hash_host
from zkapps_tpu.plonk import ConstraintFailure, check_circuit

random.seed(77)
P = Fr.p


def test_basic_gates():
    ctx = Context()
    g = GateChip(ctx)
    a = ctx.load_witness(7)
    b = ctx.load_witness(11)
    assert g.add(a, b).value == 18
    assert g.sub(a, b).value == (7 - 11) % P
    assert g.mul(a, b).value == 77
    assert g.mul_add(a, b, g.const(3)).value == 80
    assert g.neg(a).value == P - 7
    check_circuit(ctx)


def test_predicates_and_select():
    ctx = Context()
    g = GateChip(ctx)
    zero = ctx.load_witness(0)
    five = ctx.load_witness(5)
    assert g.is_zero(zero).value == 1
    assert g.is_zero(five).value == 0
    assert g.is_equal(five, ctx.load_witness(5)).value == 1
    assert g.is_equal(five, zero).value == 0
    sel1 = ctx.load_witness(1)
    sel0 = ctx.load_witness(0)
    a, b = ctx.load_witness(100), ctx.load_witness(200)
    assert g.select(a, b, sel1).value == 100
    assert g.select(a, b, sel0).value == 200
    g.assert_bit(sel1)
    g.assert_bit(sel0)
    check_circuit(ctx)


def test_copy_constraint_violation_detected():
    ctx = Context()
    g = GateChip(ctx)
    a = ctx.load_witness(1)
    with pytest.raises(AssertionError):
        g.assert_is_const(a, 2)


def test_tampered_witness_fails_check():
    ctx = Context()
    g = GateChip(ctx)
    a = ctx.load_witness(3)
    g.mul(a, a)
    ctx.advice[-1] = 10  # tamper the product output
    with pytest.raises(ConstraintFailure):
        check_circuit(ctx)


def test_in_circuit_poseidon_matches_native():
    ctx = Context()
    g = GateChip(ctx)
    pos = PoseidonGadget(ctx, g)
    for L in (2, 4):
        inputs = [random.randrange(P) for _ in range(L)]
        cells = [ctx.load_witness(v) for v in inputs]
        digest = pos.hash_fix_len_array(cells)
        assert digest.value == hash_host(inputs), f"L={L}"
    check_circuit(ctx)


def test_poseidon_gadget_row_count():
    """Document the circuit cost of one permutation (drives domain sizing)."""
    ctx = Context()
    g = GateChip(ctx)
    pos = PoseidonGadget(ctx, g)
    cells = [ctx.load_witness(i + 1) for i in range(2)]
    pos.hash_fix_len_array(cells)
    assert ctx.num_rows < 12_000  # one permutation fits well under 2^14 rows
