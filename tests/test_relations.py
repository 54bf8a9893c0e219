"""Shielder relation circuits: structural checks + cross-layer consistency.

The full prove+verify of update_note runs on TPU (bench/demo — the circuit
needs a 2^18 domain); here we validate the circuit itself the way the
reference never did (SURVEY.md §4: relations crate has NO tests upstream):
mock-prover constraint checking, witness-gen against native Poseidon, and
negative tests for every sub-relation.
"""

import random

import pytest

from zkapps_tpu.circuit import Context, GateChip, PoseidonGadget
from zkapps_tpu.fields import Fr
from zkapps_tpu.hash import hash_host
from zkapps_tpu.plonk import ConstraintFailure, check_circuit
from zkapps_tpu.relations import (
    MerkleProofWitness,
    ShielderAccount,
    ShielderOpPriv,
    ShielderOpPub,
    build_update_note_circuit,
    merkle_path_shape,
)
from zkapps_tpu.relations.shielder import (
    CircuitAccount,
    CircuitNote,
    LoadedMerkleProof,
    verify_merkle_proof_circuit,
    verify_note_circuit,
)

random.seed(2024)
P = Fr.p
DEPTH = 10


def rand():
    return random.randrange(P)


# ---------------------------------------------------------------------------
# sub-relations
# ---------------------------------------------------------------------------


def test_note_hash_circuit():
    ctx = Context()
    g = GateChip(ctx)
    pos = PoseidonGadget(ctx, g)
    vals = (rand(), rand(), rand(), rand())
    note = CircuitNote.load(ctx, *vals)
    h = hash_host(list(vals))
    verify_note_circuit(g, pos, note, ctx.load_witness(h))
    check_circuit(ctx)


def test_note_hash_circuit_rejects_wrong_hash():
    ctx = Context()
    g = GateChip(ctx)
    pos = PoseidonGadget(ctx, g)
    vals = (rand(), rand(), rand(), rand())
    note = CircuitNote.load(ctx, *vals)
    with pytest.raises(AssertionError):
        verify_note_circuit(g, pos, note, ctx.load_witness(123))


def host_merkle_root(leaf: int, path: list[int], leaf_id: int) -> int:
    cur = leaf
    idx = leaf_id
    for sib in path:
        cur = hash_host([cur, sib]) if idx % 2 == 0 else hash_host([sib, cur])
        idx //= 2
    return cur


def test_merkle_proof_circuit():
    leaf = rand()
    path = [rand() for _ in range(DEPTH)]
    leaf_id = random.randrange(1 << DEPTH)
    root = host_merkle_root(leaf, path, leaf_id)
    ctx = Context()
    g = GateChip(ctx)
    pos = PoseidonGadget(ctx, g)
    proof = LoadedMerkleProof.load(
        ctx, MerkleProofWitness(merkle_path_shape(leaf_id, DEPTH), path)
    )
    verify_merkle_proof_circuit(
        g, pos, proof, ctx.load_witness(root), ctx.load_witness(leaf)
    )
    check_circuit(ctx)


def test_merkle_proof_circuit_rejects_bad_root():
    leaf = rand()
    path = [rand() for _ in range(DEPTH)]
    root = host_merkle_root(leaf, path, 5)
    ctx = Context()
    g = GateChip(ctx)
    pos = PoseidonGadget(ctx, g)
    proof = LoadedMerkleProof.load(ctx, MerkleProofWitness(merkle_path_shape(5, DEPTH), path))
    with pytest.raises(AssertionError):
        verify_merkle_proof_circuit(
            g, pos, proof, ctx.load_witness((root + 1) % P), ctx.load_witness(leaf)
        )


def test_account_update_circuit_matches_native():
    tokens = [rand(), rand()]
    acc = ShielderAccount([(tokens[0], 100), (tokens[1], 55)])
    op = ShielderOpPub(kind=0, amount=25, token=tokens[1], user=rand())
    native_new = acc.update(op)
    assert native_new.balances[1][1] == 80

    ctx = Context()
    g = GateChip(ctx)
    acc_c = CircuitAccount.load(ctx, acc)
    op_cells = [ctx.load_witness(v) for v in op.to_vec()]
    new_c = acc_c.update(g, op_cells)
    assert [c.value for c in new_c.to_vec()] == native_new.to_vec()
    check_circuit(ctx)

    # withdraw path
    op_w = ShielderOpPub(kind=1, amount=30, token=tokens[0], user=rand())
    native_w = acc.update(op_w)
    ctx2 = Context()
    g2 = GateChip(ctx2)
    acc_c2 = CircuitAccount.load(ctx2, acc)
    op_cells2 = [ctx2.load_witness(v) for v in op_w.to_vec()]
    new_c2 = acc_c2.update(g2, op_cells2)
    assert [c.value for c in new_c2.to_vec()] == native_w.to_vec()
    check_circuit(ctx2)


def test_account_update_rejects_unknown_token():
    acc = ShielderAccount([(1, 10), (2, 20)])
    op = ShielderOpPub(kind=0, amount=5, token=999, user=7)
    ctx = Context()
    g = GateChip(ctx)
    acc_c = CircuitAccount.load(ctx, acc)
    with pytest.raises(AssertionError):
        acc_c.update(g, [ctx.load_witness(v) for v in op.to_vec()])


# ---------------------------------------------------------------------------
# the full update_note relation
# ---------------------------------------------------------------------------


def build_full_witness(kind=0, amount=10):
    """Wallet-side witness prep for a deposit/withdraw (stack 3.3)."""
    tokens = [rand(), rand()]
    user = rand()
    zk_id, trapdoor_old, nullifier_old = rand(), rand(), rand()
    trapdoor_new, nullifier_new = rand(), rand()
    old_account = ShielderAccount([(tokens[0], 500), (tokens[1], 300)])
    op_pub = ShielderOpPub(kind=kind, amount=amount, token=tokens[0], user=user)
    op_priv = ShielderOpPriv(user=user)
    new_account = old_account.update(op_pub)

    old_note = (zk_id, trapdoor_old, nullifier_old, old_account.hash())
    new_note = (zk_id, trapdoor_new, nullifier_new, new_account.hash())
    old_note_hash = hash_host(list(old_note))
    new_note_hash = hash_host(list(new_note))

    leaf_id = 3
    path = [rand() for _ in range(DEPTH)]
    merkle_root = host_merkle_root(old_note_hash, path, leaf_id)
    proof = MerkleProofWitness(merkle_path_shape(leaf_id, DEPTH), path)
    return dict(
        op_pub=op_pub,
        new_note_hash=new_note_hash,
        merkle_root=merkle_root,
        new_note=new_note,
        old_note=old_note,
        merkle_proof=proof,
        op_priv=op_priv,
        old_account=old_account,
    ), nullifier_old


def test_update_note_circuit_full():
    witness, nullifier_old = build_full_witness()
    ctx = build_update_note_circuit(**witness)
    check_circuit(ctx)
    publics = [ctx.advice[c] for c in ctx.publics]
    op = witness["op_pub"]
    # public-input order per update_note.rs:119-127
    assert publics == [
        op.kind,
        op.amount,
        op.token,
        op.user,
        witness["new_note_hash"],
        witness["merkle_root"],
        nullifier_old,
    ]
    # Poseidon custom gate: 18 permutations (4 hashes of 4 elts = 2 perms
    # each + 10 merkle levels) x 65 rows; drives a 2^12 proving domain
    # (vs 2^18 for the flat lowering).
    assert ctx.p_num_rows == 18 * 65
    assert max(ctx.num_rows, ctx.p_num_rows) < (1 << 12) - 4


def test_update_note_flat_lowering_matches_gate():
    witness, _ = build_full_witness()
    ctx_gate = build_update_note_circuit(**witness)
    ctx_flat = build_update_note_circuit(**witness, poseidon_gate=False)
    check_circuit(ctx_flat)
    assert ctx_flat.p_num_rows == 0
    assert ctx_flat.num_rows < (1 << 18) - 4
    # identical public-input vectors from both lowerings
    pubs_gate = [ctx_gate.advice[c] % P for c in ctx_gate.publics]
    pubs_flat = [ctx_flat.advice[c] % P for c in ctx_flat.publics]
    assert pubs_gate == pubs_flat


def test_update_note_circuit_withdraw():
    witness, _ = build_full_witness(kind=1, amount=123)
    ctx = build_update_note_circuit(**witness)
    check_circuit(ctx)


def test_update_note_rejects_wrong_user():
    witness, _ = build_full_witness()
    witness["op_priv"] = ShielderOpPriv(user=(witness["op_pub"].user + 1) % P)
    with pytest.raises(AssertionError):
        build_update_note_circuit(**witness)


def test_update_note_rejects_tampered_new_note_hash():
    witness, _ = build_full_witness()
    witness["new_note_hash"] = (witness["new_note_hash"] + 1) % P
    with pytest.raises(AssertionError):
        build_update_note_circuit(**witness)


def test_update_note_rejects_wrong_merkle_root():
    witness, _ = build_full_witness()
    witness["merkle_root"] = (witness["merkle_root"] + 1) % P
    with pytest.raises(AssertionError):
        build_update_note_circuit(**witness)


# ---------------------------------------------------------------------------
# Generic Account/Operation protocol (account.rs:8-21, operation.rs:3-23):
# a SECOND account family plugs into the same update_note relation.
# ---------------------------------------------------------------------------


class CounterOpPub:
    """Toy op: [amount, tag]."""

    def __init__(self, amount, tag):
        self.amount, self.tag = amount, tag

    def to_vec(self):
        return [self.amount, self.tag]


class CounterOpPriv:
    """Private half: [tag] (combine constrains tag equality)."""

    def __init__(self, tag):
        self.tag = tag

    def to_vec(self):
        return [self.tag]


class CounterAccount:
    """Toy single-counter account: state = [count]."""

    def __init__(self, count):
        self.count = count

    def to_vec(self):
        return [self.count]

    def hash(self):
        return hash_host(self.to_vec())

    def update(self, op):
        return CounterAccount((self.count + op.amount) % P)


class CircuitCounterAccount:
    def __init__(self, cells):
        self.cells = cells

    @staticmethod
    def load(ctx, account):
        return CircuitCounterAccount([ctx.load_witness(v) for v in account.to_vec()])

    def to_vec(self):
        return list(self.cells)

    def update(self, gate, op_cells):
        amount = op_cells[0]
        return CircuitCounterAccount([gate.add(self.cells[0], amount)])


def _counter_combine(gate, op_priv_cells, op_pub_cells):
    eq = gate.is_equal(op_priv_cells[0], op_pub_cells[1])
    gate.assert_is_const(eq, 1)
    return op_pub_cells


def _counter_model():
    from zkapps_tpu.relations import AccountModel

    return AccountModel(load=CircuitCounterAccount.load, circuit_combine=_counter_combine)


def build_counter_witness(amount=7, tamper_tag=False):
    tag = rand()
    zk_id, trapdoor_old, nullifier_old = rand(), rand(), rand()
    trapdoor_new, nullifier_new = rand(), rand()
    old_account = CounterAccount(42)
    op_pub = CounterOpPub(amount=amount, tag=tag)
    op_priv = CounterOpPriv(tag=(tag + 1) % P if tamper_tag else tag)
    new_account = old_account.update(op_pub)

    old_note = (zk_id, trapdoor_old, nullifier_old, old_account.hash())
    new_note = (zk_id, trapdoor_new, nullifier_new, new_account.hash())
    old_note_hash = hash_host(list(old_note))

    leaf_id = 5
    path = [rand() for _ in range(DEPTH)]
    merkle_root = host_merkle_root(old_note_hash, path, leaf_id)
    proof = MerkleProofWitness(merkle_path_shape(leaf_id, DEPTH), path)
    return dict(
        op_pub=op_pub,
        new_note_hash=hash_host(list(new_note)),
        merkle_root=merkle_root,
        new_note=new_note,
        old_note=old_note,
        merkle_proof=proof,
        op_priv=op_priv,
        old_account=old_account,
        model=_counter_model(),
    )


def test_generic_account_second_family():
    """A toy second account family proves through the SAME relation."""
    ctx = build_update_note_circuit(**build_counter_witness())
    check_circuit(ctx)
    # publics: [op_pub (2 cells)..., new_note_hash, merkle_root, nullifier]
    assert len(ctx.publics) == 2 + 3


def test_generic_account_combine_rejects_mismatch():
    with pytest.raises(AssertionError):
        ctx = build_update_note_circuit(**build_counter_witness(tamper_tag=True))
        check_circuit(ctx)


def test_generic_account_wrong_state_transition_rejected():
    witness = build_counter_witness()
    # claim a new note whose account hash skips the operation
    zk_id, trapdoor, nullifier, _ = witness["new_note"]
    bad_note = (zk_id, trapdoor, nullifier, CounterAccount(41).hash())
    witness["new_note"] = bad_note
    witness["new_note_hash"] = hash_host(list(bad_note))
    with pytest.raises(AssertionError):
        ctx = build_update_note_circuit(**witness)
        check_circuit(ctx)
