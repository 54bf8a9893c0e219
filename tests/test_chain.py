"""Tier-2 (contract-module) + tier-3 (scenario) tests.

Tier 2 mirrors contract/merkle.rs tests; tier 3 mirrors the three drink
scenarios in contract/drink_tests/mod.rs with the same balance assertions.
"""

import random

import pytest

from zkapps_tpu.chain import (
    AccountId,
    MerkleTreeLimitExceeded,
    NullifierIsInSet,
    PSP22Token,
    Session,
    ShielderContract,
)
from zkapps_tpu.chain.client import (
    create_shielder_account,
    deposit_op,
    shielder_update,
    withdraw_op,
)
from zkapps_tpu.chain.merkle_contract import MerkleTree
from zkapps_tpu.mocked import Scalar, combine_merkle_hash


# ---------------------------------------------------------------------------
# Tier 2: merkle.rs unit tests
# ---------------------------------------------------------------------------


def test_add_two_leaves_and_root():
    tree = MerkleTree(10)
    assert tree.add_leaf(Scalar.from_u128(1)) == 0
    assert tree.add_leaf(Scalar.from_u128(2)) == 1

    z = Scalar.from_u128(0)
    hash_left = combine_merkle_hash(Scalar.from_u128(1), Scalar.from_u128(2))
    for _ in range(1, 10):
        hash_left = combine_merkle_hash(hash_left, z)
    assert hash_left == tree.root()


def test_size_limit():
    tree = MerkleTree(10)
    for i in range(1 << 10):
        tree.add_leaf(Scalar.from_u128(i))
    with pytest.raises(MerkleTreeLimitExceeded):
        tree.add_leaf(Scalar.from_u128(0))


def test_historical_root():
    tree = MerkleTree(10)
    roots = []
    for i in range(10):
        tree.add_leaf(Scalar.from_u128(i))
        roots.append(tree.root())
    # "redeploy"
    tree2 = MerkleTree(10)
    for i in range(10):
        for r in roots[:i]:
            assert tree2.is_historical_root(r)
        for r in roots[i:]:
            assert not tree2.is_historical_root(r)
        tree2.add_leaf(Scalar.from_u128(i))


# ---------------------------------------------------------------------------
# Tier 3: drink scenarios
# ---------------------------------------------------------------------------


def setup_chain(supply: int):
    session = Session()
    alice = AccountId.new(0x01)
    session.with_actor(alice)
    token_addr = session.deploy(PSP22Token(supply, alice))
    tokens = [Scalar(token_addr.bytes), Scalar.from_u128(0)]
    shielder_addr = session.deploy(ShielderContract(tokens))
    return session, alice, token_addr, shielder_addr


def rand_scalar(rng):
    return Scalar.from_u128(rng.getrandbits(128))


def balance(session, token, who):
    return session.call(token, "balance_of", who)


def test_deploy_single_deposit_single_withdraw():
    rng = random.Random(1)
    session, alice, token, shielder = setup_chain(100)
    bob = AccountId.new(0x02)

    user_data = create_shielder_account(session, shielder, token, rand_scalar(rng))
    session.call(token, "approve", shielder, 10)
    user_data = shielder_update(
        session, shielder, deposit_op(token, alice, 10), user_data, rand_scalar(rng)
    )
    assert balance(session, token, alice) == 90
    assert balance(session, token, shielder) == 10

    session.with_actor(bob)
    shielder_update(session, shielder, withdraw_op(token, bob, 1), user_data, rand_scalar(rng))
    assert balance(session, token, bob) == 1
    assert balance(session, token, shielder) == 9


def test_deploy_single_deposit_multiple_withdraw():
    rng = random.Random(2)
    session, alice, token, shielder = setup_chain(100)
    withdrawers = [AccountId.new(i) for i in range(3, 11)]

    user_data = create_shielder_account(session, shielder, token, rand_scalar(rng))
    session.call(token, "approve", shielder, 50)
    assert session.call(token, "allowance", alice, shielder) == 50
    user_data = shielder_update(
        session, shielder, deposit_op(token, alice, 50), user_data, rand_scalar(rng)
    )
    for w in withdrawers:
        session.with_actor(w)
        user_data = shielder_update(
            session, shielder, withdraw_op(token, w, 1), user_data, rand_scalar(rng)
        )
        assert balance(session, token, w) == 1
    assert balance(session, token, shielder) == 42


def test_deploy_multiple_deposit_multiple_withdraw():
    rng = random.Random(3)
    session, alice, token, shielder = setup_chain(800)
    depositors = [AccountId.new(i) for i in range(3, 11)]
    withdrawers = [AccountId.new(i) for i in range(11, 19)]

    for d in depositors:
        session.call(token, "transfer", d, 100)

    user_data = []
    for i, d in enumerate(depositors):
        session.with_actor(d)
        user_data.append(create_shielder_account(session, shielder, token, rand_scalar(rng)))
        session.call(token, "approve", shielder, 50)
        user_data[i] = shielder_update(
            session, shielder, deposit_op(token, d, 50), user_data[i], rand_scalar(rng)
        )

    for i, w in enumerate(withdrawers):
        session.with_actor(w)
        user_data[i] = shielder_update(
            session, shielder, withdraw_op(token, w, 1), user_data[i], rand_scalar(rng)
        )
        assert balance(session, token, w) == 1
    assert balance(session, token, shielder) == 400 - 8


# ---------------------------------------------------------------------------
# Negative paths the reference relies on (protocol fault tolerance, SURVEY §5)
# ---------------------------------------------------------------------------


def test_double_spend_rejected_and_rolled_back():
    rng = random.Random(4)
    session, alice, token, shielder = setup_chain(100)
    user_data = create_shielder_account(session, shielder, token, rand_scalar(rng))
    session.call(token, "approve", shielder, 10)
    user_data = shielder_update(
        session, shielder, deposit_op(token, alice, 10), user_data, rand_scalar(rng)
    )
    # Re-submitting the same (proof, nullifier) must fail with NullifierIsInSet.
    root = session.call(shielder, "notes_merkle_root")
    with pytest.raises(NullifierIsInSet):
        # user_data.nullifier was consumed by the deposit above
        op = withdraw_op(token, alice, 1)
        from zkapps_tpu.mocked import Operation

        operation = Operation.combine(op.op_pub, op.op_priv)
        path = session.call(shielder, "notes_merkle_path", user_data.tree_leaf_id)
        note_hash, proof2 = user_data.proof.update_account(
            operation, Scalar.from_u128(1), rand_scalar(rng), path, user_data.tree_leaf_id
        )
        # replay the old (already-spent) nullifier twice
        session.call(
            shielder, "update_note", op.op_pub, note_hash, root, user_data.nullifier, proof2
        )
        session.call(
            shielder, "update_note", op.op_pub, note_hash, root, user_data.nullifier, proof2
        )


def test_historical_root_still_accepted():
    """In-flight proofs against an old root remain valid after new insertions."""
    rng = random.Random(5)
    session, alice, token, shielder = setup_chain(100)
    user_data = create_shielder_account(session, shielder, token, rand_scalar(rng))
    session.call(token, "approve", shielder, 20)
    user_data = shielder_update(
        session, shielder, deposit_op(token, alice, 10), user_data, rand_scalar(rng)
    )
    # Capture root + path NOW (pre-insertion snapshot).
    root = session.call(shielder, "notes_merkle_root")
    path = session.call(shielder, "notes_merkle_path", user_data.tree_leaf_id)
    # Another user creates an account, changing the current root.
    charlie = AccountId.new(0x30)
    session.with_actor(charlie)
    create_shielder_account(session, shielder, token, rand_scalar(rng))
    assert session.call(shielder, "notes_merkle_root") != root
    # Alice's in-flight proof against the OLD root still verifies on-chain.
    session.with_actor(alice)
    from zkapps_tpu.mocked import Operation

    op = deposit_op(token, alice, 10)
    operation = Operation.combine(op.op_pub, op.op_priv)
    note_hash, proof2 = user_data.proof.update_account(
        operation, Scalar.from_u128(1), rand_scalar(rng), path, user_data.tree_leaf_id
    )
    leaf = session.call(
        shielder, "update_note", op.op_pub, note_hash, root, user_data.nullifier, proof2
    )
    assert leaf == 3
