"""SNARK wallet — client-side witness holder and prover driver.

The Poseidon/PLONK twin of mocked_zk's ZkProof "knowledge object"
(relations.rs:16-26) driving the exact wallet protocol of SURVEY.md §3.3:
fetch merkle root + path from the contract, update the account locally,
build the update_note witness circuit, prove on the TPU, and submit.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import Fr
from ..hash.poseidon import hash_host
from ..mocked import Scalar
from .shielder import (
    MerkleProofWitness,
    ShielderAccount,
    ShielderOpPriv,
    ShielderOpPub,
    build_update_note_circuit,
    merkle_path_shape,
)

P = Fr.p
DEPTH = 10


def note_hash(zk_id: int, trapdoor: int, nullifier: int, account_hash: int) -> int:
    return hash_host([zk_id, trapdoor, nullifier, account_hash])


@dataclass
class SnarkWallet:
    """Private witness state for one shielded account (Fr elements)."""

    zk_id: int
    trapdoor_new: int
    trapdoor_old: int
    nullifier_new: int
    account_old: ShielderAccount
    account_new: ShielderAccount

    @staticmethod
    def create(zk_id: int, trapdoor: int, nullifier: int, tokens: list[int]) -> "SnarkWallet":
        acc = ShielderAccount([(t, 0) for t in tokens])
        return SnarkWallet(
            zk_id=zk_id,
            trapdoor_new=trapdoor,
            trapdoor_old=0,
            nullifier_new=nullifier,
            account_old=acc,
            account_new=acc,
        )

    def creation_note_hash(self) -> int:
        return note_hash(
            self.zk_id, self.trapdoor_new, self.nullifier_new, self.account_new.hash()
        )

    def build_update(
        self,
        op_pub: ShielderOpPub,
        op_priv: ShielderOpPriv,
        trapdoor_next: int,
        nullifier_next: int,
        merkle_path: list[int],
        merkle_root: int,
        leaf_id: int,
    ):
        """Roll the witness forward; returns (new_note_hash, circuit_ctx,
        next_wallet).  The circuit's publics are ready for the prover."""
        account_updated = self.account_new.update(op_pub)
        old_note = (
            self.zk_id,
            self.trapdoor_new,
            self.nullifier_new,
            self.account_new.hash(),
        )
        new_note = (self.zk_id, trapdoor_next, nullifier_next, account_updated.hash())
        h_new = note_hash(*new_note)
        proof_w = MerkleProofWitness(merkle_path_shape(leaf_id, len(merkle_path)), merkle_path)
        ctx = build_update_note_circuit(
            op_pub=op_pub,
            new_note_hash=h_new,
            merkle_root=merkle_root,
            new_note=new_note,
            old_note=old_note,
            merkle_proof=proof_w,
            op_priv=op_priv,
            old_account=self.account_new,  # the account behind old_note
        )
        next_wallet = SnarkWallet(
            zk_id=self.zk_id,
            trapdoor_new=trapdoor_next,
            trapdoor_old=self.trapdoor_new,
            nullifier_new=nullifier_next,
            account_old=self.account_new,
            account_new=account_updated,
        )
        return h_new, ctx, next_wallet
