"""SNARK-backed Shielder: the real prover slotted in where ZkProof sat.

The reference architected mocked_zk (L3) and the relations crate (L2) as
parallel alternatives behind one conceptual interface (SURVEY.md §1): the
contract only calls ``proof.verify_creation`` / ``proof.verify_update``.
This module provides that interface backed by the TPU PLONK prover:

- Scalars on this chain variant carry Fr elements (LE bytes of the residue);
  the note tree hashes with Poseidon (``poseidon_combine``).
- ``SnarkUpdateProof`` wraps proof bytes for the update_note relation; its
  ``verify_update`` derives the public-input vector in the canonical order
  (update_note.rs:119-127) and runs the PLONK verifier.
- Account creation has NO relation in the reference's relations crate (only
  update_note/update_account exist), so ``CreationAttestation`` mirrors the
  reference's plaintext creation check (mocked_zk relations.rs:127-136) over
  Poseidon — faithful to the upstream design, where creating an empty note
  reveals nothing private.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import Fr
from ..hash.poseidon import hash_host
from ..mocked import Scalar
from ..relations.shielder import ShielderAccount, ShielderOpPub, encode_scalar_to_fr
from .errors import ZkpVerificationFail

P = Fr.p


def fr_scalar(v: int) -> Scalar:
    """Fr element -> chain Scalar (LE bytes)."""
    return Scalar(Fr.to_bytes(v % P))


def scalar_fr(s: Scalar) -> int:
    return encode_scalar_to_fr(s.bytes)


def poseidon_combine(first: Scalar, second: Scalar) -> Scalar:
    """2-ary Poseidon merkle combiner over Fr-carrying Scalars."""
    return fr_scalar(hash_host([scalar_fr(first), scalar_fr(second)]))


def op_pub_from_chain(op) -> ShielderOpPub:
    """chain OpPub (kind/amount/token/user Scalars) -> Fr-encoded relation op."""
    return ShielderOpPub(
        kind=0 if op.kind == "deposit" else 1,
        amount=op.amount % P,
        token=encode_scalar_to_fr(op.token.bytes),
        user=encode_scalar_to_fr(op.user.bytes),
    )


@dataclass
class SnarkVerifierBackend:
    """Holds the verifying key + KZG params for the update_note relation."""

    vk: object
    kzg: object

    def verify(self, proof_bytes: bytes, publics: list[int]) -> bool:
        from ..plonk import verify

        return verify(self.vk, self.kzg, proof_bytes, publics)


@dataclass
class SnarkUpdateProof:
    """Proof object for Contract.update_note in the SNARK-backed deployment."""

    backend: SnarkVerifierBackend
    proof_bytes: bytes

    def verify_update(self, op_pub, h_note_new: Scalar, merkle_root: Scalar, nullifier_old: Scalar):
        rel_op = op_pub_from_chain(op_pub)
        publics = rel_op.to_vec() + [
            scalar_fr(h_note_new),
            scalar_fr(merkle_root),
            scalar_fr(nullifier_old),
        ]
        if not self.backend.verify(self.proof_bytes, publics):
            raise ZkpVerificationFail()

    def verify_creation(self, h_note_new, tokens_list):  # pragma: no cover
        raise ZkpVerificationFail()  # creation uses CreationAttestation


@dataclass
class CreationAttestation:
    """Plaintext empty-note creation check (reference relations.rs:127-136)."""

    zk_id: int
    trapdoor: int
    nullifier: int

    def verify_creation(self, h_note_new: Scalar, tokens_list: list[Scalar]) -> None:
        tokens_fr = [scalar_fr(t) for t in tokens_list]
        account = ShielderAccount([(t, 0) for t in tokens_fr])
        h_acc = account.hash()
        h = hash_host([self.zk_id, self.trapdoor, self.nullifier, h_acc])
        if fr_scalar(h) != h_note_new:
            raise ZkpVerificationFail()
