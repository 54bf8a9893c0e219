"""The Shielder contract — behavioral twin of shielder/contract/lib.rs.

Storage: nullifier set, 2^10-leaf note Merkle tree with historical-roots log,
and the supported-token list.  Messages: ``add_note`` (account creation),
``update_note`` (deposit/withdraw with nullifier + historical-root checks and
the PSP22 cross-contract transfer), plus the three views.

The proof argument is any object exposing ``verify_creation(h_note_new,
tokens)`` and ``verify_update(op_pub, h_note_new, merkle_root,
nullifier_old)`` — the mocked ZkProof by default, the real SNARK proof wrapper
(zkapps_tpu.relations.snark_proof) when the TPU prover is swapped in; this is
exactly the L3 <-> L2 swap the reference architected (SURVEY.md §1).
"""

from __future__ import annotations

from ..mocked import MERKLE_TREE_DEPTH, OpPub, Scalar, TOKENS_NUMBER
from .errors import NullifierIsInSet, MerkleTreeVerificationFail
from .merkle_contract import MerkleTree
from .session import AccountId, Env


class ShielderContract:
    def __init__(self, supported_tokens: list[Scalar], combine=None):
        assert len(supported_tokens) == TOKENS_NUMBER
        if combine is None:
            self.notes = MerkleTree(MERKLE_TREE_DEPTH)
        else:
            self.notes = MerkleTree(MERKLE_TREE_DEPTH, combine=combine)
        self.nullifier_set: set[Scalar] = set()
        self.supported_tokens_list = list(supported_tokens)

    # -- messages ------------------------------------------------------
    def add_note(self, env: Env, h_note_new: Scalar, proof) -> int:
        proof.verify_creation(h_note_new, self.supported_tokens_list)
        return self.notes.add_leaf(h_note_new)

    def update_note(
        self,
        env: Env,
        op_pub: OpPub,
        h_note_new: Scalar,
        merkle_root: Scalar,
        nullifier_old: Scalar,
        proof,
    ) -> int:
        if not self.notes.is_historical_root(merkle_root):
            raise MerkleTreeVerificationFail()
        self._nullify(nullifier_old)
        proof.verify_update(op_pub, h_note_new, merkle_root, nullifier_old)
        leaf_id = self.notes.add_leaf(h_note_new)
        self._process_operation(env, op_pub)
        return leaf_id

    # -- views ---------------------------------------------------------
    def notes_merkle_root(self, env: Env) -> Scalar:
        return self.notes.root()

    def notes_merkle_path(self, env: Env, note_id: int) -> list[Scalar]:
        # WARNING (as in the reference): querying a path may expose identity.
        return self.notes.gen_proof(note_id)

    def supported_tokens(self, env: Env) -> list[Scalar]:
        return list(self.supported_tokens_list)

    # -- internals -----------------------------------------------------
    def _nullify(self, nullifier: Scalar) -> None:
        if nullifier in self.nullifier_set:
            raise NullifierIsInSet()
        self.nullifier_set.add(nullifier)

    def _process_operation(self, env: Env, op_pub: OpPub) -> None:
        token_addr = AccountId(op_pub.token.bytes)
        user_addr = AccountId(op_pub.user.bytes)
        if op_pub.kind == "deposit":
            env.cross_call(token_addr, "transfer_from", user_addr, env.callee, op_pub.amount)
        else:
            env.cross_call(token_addr, "transfer", user_addr, op_pub.amount)
