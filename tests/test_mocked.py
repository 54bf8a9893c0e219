"""Tier-1 unit tests — behavioral twins of mocked_zk/src/tests.rs + scalar.rs."""

import pytest

from zkapps_tpu.mocked import (
    MOCKED_TOKEN,
    TOKENS_NUMBER,
    Account,
    AccountUpdateError,
    Note,
    OperationCombineError,
    OpPriv,
    OpPub,
    Operation,
    Scalar,
    VerificationError,
    ZkProof,
    mocked_user,
)


def supported_tokens():
    tokens = [Scalar.from_u128(0)] * TOKENS_NUMBER
    tokens[0] = MOCKED_TOKEN
    return tokens


def create_empty_note_proof(id_, nullifier, trapdoor):
    acc_new = Account.new(supported_tokens())
    note = Note(id_, trapdoor, nullifier, acc_new.hash())
    proof = ZkProof.new(id_, trapdoor, nullifier, OpPriv(mocked_user()), acc_new)
    return note.hash(), proof


def test_scalar_from_u128():
    # mocked_zk/src/scalar.rs test vectors
    s = Scalar.from_u128(123456)
    expect = bytearray(32)
    expect[2], expect[1], expect[0] = 0x01, 0xE2, 0x40
    assert s.bytes == bytes(expect)

    b = bytearray(32)
    b[3], b[2], b[1], b[0] = 0x3A, 0xDE, 0x68, 0xB1
    assert Scalar(bytes(b)).to_u128() == 987654321


def test_create_note():
    z = Scalar.from_u128(0)
    h_new_note, proof = create_empty_note_proof(z, z, z)
    proof.verify_creation(h_new_note, supported_tokens())  # must not raise


def test_create_note_fails():
    z = Scalar.from_u128(0)
    _, proof = create_empty_note_proof(z, z, z)
    h_new_note, _ = create_empty_note_proof(Scalar.from_u128(1), z, z)
    with pytest.raises(VerificationError):
        proof.verify_creation(h_new_note, supported_tokens())


def test_account_hash_quirk():
    """account.rs:17-24 hashes only the LAST token's balance — preserved."""
    tokens = supported_tokens()
    a = Account.new(tokens)
    # Change token-0 balance only: hash must NOT change (the quirk).
    op = Operation.combine(
        OpPub("deposit", 5, MOCKED_TOKEN, mocked_user()), OpPriv(mocked_user())
    )
    b = a.update(op)
    assert a.hash() == b.hash()
    # Changing token-1 balance changes the hash.
    t1 = tokens[1]
    op1 = Operation.combine(OpPub("deposit", 5, t1, mocked_user()), OpPriv(mocked_user()))
    c = a.update(op1)
    assert a.hash() != c.hash()


def test_account_update_checked_arithmetic():
    a = Account.new(supported_tokens())
    user = mocked_user()
    with pytest.raises(AccountUpdateError):  # withdraw from empty
        a.update(Operation.combine(OpPub("withdraw", 1, MOCKED_TOKEN, user), OpPriv(user)))
    with pytest.raises(AccountUpdateError):  # unknown token
        a.update(
            Operation.combine(OpPub("deposit", 1, Scalar.from_u128(99), user), OpPriv(user))
        )
    big = (1 << 128) - 1
    b = a.update(Operation.combine(OpPub("deposit", big, MOCKED_TOKEN, user), OpPriv(user)))
    with pytest.raises(AccountUpdateError):  # u128 overflow
        b.update(Operation.combine(OpPub("deposit", 1, MOCKED_TOKEN, user), OpPriv(user)))


def test_operation_combine_checks_user():
    user = mocked_user()
    other = Scalar.from_u128(2)
    with pytest.raises(OperationCombineError):
        Operation.combine(OpPub("deposit", 1, MOCKED_TOKEN, user), OpPriv(other))


def test_full_witness_lifecycle():
    """relations.rs: create -> deposit -> withdraw via update_account/verify_update."""
    from zkapps_tpu.chain.merkle_contract import MerkleTree

    z = Scalar.from_u128(0)
    user = mocked_user()
    h_note, proof = create_empty_note_proof(z, z, z)
    tree = MerkleTree(10)
    leaf_id = tree.add_leaf(h_note)

    op = Operation.combine(OpPub("deposit", 10, MOCKED_TOKEN, user), OpPriv(user))
    root = tree.root()
    path = tree.gen_proof(leaf_id)
    new_hash, new_proof = proof.update_account(
        op, Scalar.from_u128(7), Scalar.from_u128(8), path, leaf_id
    )
    # on-chain verification passes
    new_proof.verify_update(op.op_pub, new_hash, root, z)
    tree.add_leaf(new_hash)

    # replaying against the wrong nullifier fails
    with pytest.raises(VerificationError):
        new_proof.verify_update(op.op_pub, new_hash, root, Scalar.from_u128(42))
