"""Wallet-side protocol driver — the drink test utils flow (SURVEY.md §3.3).

Replicates drink_tests/utils/shielder.rs: fetch merkle root + path from the
contract, update the account locally ("proving"), submit update_note.  When
the real TPU prover replaces the mock, only ``proof.update_account`` changes
meaning (witness generation + SNARK proving) — the protocol is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..mocked import Account, Note, OpPriv, OpPub, Operation, Scalar, ZkProof
from .session import AccountId, Session


@dataclass
class ShielderUserEnv:
    proof: ZkProof
    nullifier: Scalar
    tree_leaf_id: int


@dataclass
class UpdateOperation:
    op_pub: OpPub
    op_priv: OpPriv


def deposit_op(token: AccountId, user: AccountId, amount: int) -> UpdateOperation:
    return UpdateOperation(
        op_pub=OpPub("deposit", amount, Scalar(token.bytes), Scalar(user.bytes)),
        op_priv=OpPriv(Scalar(user.bytes)),
    )


def withdraw_op(token: AccountId, user: AccountId, amount: int) -> UpdateOperation:
    return UpdateOperation(
        op_pub=OpPub("withdraw", amount, Scalar(token.bytes), Scalar(user.bytes)),
        op_priv=OpPriv(Scalar(user.bytes)),
    )


def create_shielder_account(
    session: Session, shielder: AccountId, token: AccountId, nullifier: Scalar
) -> ShielderUserEnv:
    """drink_tests/utils/shielder.rs:43-76 — empty note creation."""
    tokens = [Scalar(token.bytes), Scalar.from_u128(0)]
    acc = Account.new(tokens)
    id_ = Scalar.from_u128(0)
    trapdoor = Scalar.from_u128(0)
    op_priv = OpPriv(Scalar.from_u128(0))
    proof = ZkProof.new(id_, trapdoor, nullifier, op_priv, acc)
    h_note_new = Note(id_, trapdoor, nullifier, acc.hash()).hash()
    leaf_id = session.call(shielder, "add_note", h_note_new, proof)
    return ShielderUserEnv(proof=proof, nullifier=nullifier, tree_leaf_id=leaf_id)


def shielder_update(
    session: Session,
    shielder: AccountId,
    upd_op: UpdateOperation,
    user_data: ShielderUserEnv,
    nullifier: Scalar,
) -> ShielderUserEnv:
    """drink_tests/utils/shielder.rs:78-133 — the full wallet flow."""
    merkle_root = session.call(shielder, "notes_merkle_root")
    merkle_proof = session.call(shielder, "notes_merkle_path", user_data.tree_leaf_id)
    trapdoor_new = Scalar.from_u128(1)
    operation = Operation.combine(upd_op.op_pub, upd_op.op_priv)
    note_hash, new_proof = user_data.proof.update_account(
        operation, trapdoor_new, nullifier, merkle_proof, user_data.tree_leaf_id
    )
    new_leaf_id = session.call(
        shielder,
        "update_note",
        upd_op.op_pub,
        note_hash,
        merkle_root,
        user_data.nullifier,
        new_proof,
    )
    return ShielderUserEnv(proof=new_proof, nullifier=nullifier, tree_leaf_id=new_leaf_id)
