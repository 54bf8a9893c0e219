"""SNARK-backed Shielder protocol glue (CPU: stubbed prover, real circuits).

Runs the full wallet<->contract protocol with the Poseidon note tree and the
update_note circuit built per transaction; the PLONK prove/verify pair is
replaced by a stub that (a) mock-checks the circuit and (b) verifies the
claimed publics equal the circuit's publics — i.e. exactly the completeness
property the real prover provides.  The real prove+verify path is exercised
by test_plonk (small circuit) and the TPU demo (full relation).
"""

import random

from zkapps_tpu.chain import AccountId, PSP22Token, Session, ShielderContract
from zkapps_tpu.chain.client import deposit_op, withdraw_op
from zkapps_tpu.chain.errors import ZkpVerificationFail
from zkapps_tpu.chain.snark import (
    CreationAttestation,
    SnarkUpdateProof,
    fr_scalar,
    op_pub_from_chain,
    poseidon_combine,
    scalar_fr,
)
from zkapps_tpu.fields import Fr
from zkapps_tpu.mocked import Scalar
from zkapps_tpu.plonk import check_circuit
from zkapps_tpu.relations import ShielderOpPriv
from zkapps_tpu.relations.wallet import SnarkWallet

import pytest

random.seed(60)
P = Fr.p


class StubBackend:
    """Stands in for (vk, kzg): 'verifies' by replaying circuit publics."""

    def __init__(self):
        self.issued: dict[bytes, list[int]] = {}

    def issue(self, ctx) -> bytes:
        check_circuit(ctx)
        publics = [ctx.advice[c] % P for c in ctx.publics]
        tag = random.getrandbits(256).to_bytes(32, "little")
        self.issued[tag] = publics
        return tag

    def verify(self, proof_bytes: bytes, publics: list[int]) -> bool:
        return self.issued.get(proof_bytes) == publics


@pytest.fixture
def chain():
    session = Session()
    alice = AccountId.new(0x01)
    session.with_actor(alice)
    token_addr = session.deploy(PSP22Token(100, alice))
    tokens = [Scalar(token_addr.bytes), Scalar.from_u128(0)]
    shielder_addr = session.deploy(ShielderContract(tokens, combine=poseidon_combine))
    backend = StubBackend()
    return session, alice, token_addr, shielder_addr, backend


def test_snark_deposit_withdraw_protocol(chain):
    session, alice, token_addr, shielder_addr, backend = chain
    tokens_fr = [scalar_fr(Scalar(token_addr.bytes)), 0]

    # CREATE: plaintext attestation (no creation relation upstream either)
    wallet = SnarkWallet.create(
        zk_id=random.randrange(P),
        trapdoor=random.randrange(P),
        nullifier=random.randrange(P),
        tokens=tokens_fr,
    )
    h_note = fr_scalar(wallet.creation_note_hash())
    att = CreationAttestation(wallet.zk_id, wallet.trapdoor_new, wallet.nullifier_new)
    leaf_id = session.call(shielder_addr, "add_note", h_note, att)
    assert leaf_id == 0

    # DEPOSIT 10
    session.call(token_addr, "approve", shielder_addr, 10)
    op = deposit_op(token_addr, alice, 10)
    root = session.call(shielder_addr, "notes_merkle_root")
    path = session.call(shielder_addr, "notes_merkle_path", leaf_id)
    rel_op = op_pub_from_chain(op.op_pub)
    h_new, ctx, wallet2 = wallet.build_update(
        rel_op,
        ShielderOpPriv(user=rel_op.user),
        trapdoor_next=random.randrange(P),
        nullifier_next=random.randrange(P),
        merkle_path=[scalar_fr(s) for s in path],
        merkle_root=scalar_fr(root),
        leaf_id=leaf_id,
    )
    proof = SnarkUpdateProof(backend, backend.issue(ctx))
    leaf_id2 = session.call(
        shielder_addr,
        "update_note",
        op.op_pub,
        fr_scalar(h_new),
        root,
        fr_scalar(wallet.nullifier_new),
        proof,
    )
    assert session.call(token_addr, "balance_of", shielder_addr) == 10
    assert wallet2.account_new.balances[0][1] == 10

    # WITHDRAW 4 to bob
    bob = AccountId.new(0x02)
    session.with_actor(bob)
    opw = withdraw_op(token_addr, bob, 4)
    root2 = session.call(shielder_addr, "notes_merkle_root")
    path2 = session.call(shielder_addr, "notes_merkle_path", leaf_id2)
    rel_opw = op_pub_from_chain(opw.op_pub)
    h_new2, ctx2, wallet3 = wallet2.build_update(
        rel_opw,
        ShielderOpPriv(user=rel_opw.user),
        trapdoor_next=random.randrange(P),
        nullifier_next=random.randrange(P),
        merkle_path=[scalar_fr(s) for s in path2],
        merkle_root=scalar_fr(root2),
        leaf_id=leaf_id2,
    )
    proof2 = SnarkUpdateProof(backend, backend.issue(ctx2))
    session.call(
        shielder_addr,
        "update_note",
        opw.op_pub,
        fr_scalar(h_new2),
        root2,
        fr_scalar(wallet2.nullifier_new),
        proof2,
    )
    assert session.call(token_addr, "balance_of", bob) == 4
    assert session.call(token_addr, "balance_of", shielder_addr) == 6
    assert wallet3.account_new.balances[0][1] == 6


def test_snark_rejects_tampered_publics(chain):
    session, alice, token_addr, shielder_addr, backend = chain
    tokens_fr = [scalar_fr(Scalar(token_addr.bytes)), 0]
    wallet = SnarkWallet.create(1, 2, 3, tokens_fr)
    h_note = fr_scalar(wallet.creation_note_hash())
    att = CreationAttestation(wallet.zk_id, wallet.trapdoor_new, wallet.nullifier_new)
    leaf_id = session.call(shielder_addr, "add_note", h_note, att)
    session.call(token_addr, "approve", shielder_addr, 10)
    op = deposit_op(token_addr, alice, 10)
    root = session.call(shielder_addr, "notes_merkle_root")
    path = session.call(shielder_addr, "notes_merkle_path", leaf_id)
    rel_op = op_pub_from_chain(op.op_pub)
    h_new, ctx, _ = wallet.build_update(
        rel_op,
        ShielderOpPriv(user=rel_op.user),
        4,
        5,
        [scalar_fr(s) for s in path],
        scalar_fr(root),
        leaf_id,
    )
    proof = SnarkUpdateProof(backend, backend.issue(ctx))
    # submit with a different note hash than proven -> publics mismatch
    with pytest.raises(ZkpVerificationFail):
        session.call(
            shielder_addr,
            "update_note",
            op.op_pub,
            fr_scalar((h_new + 1) % P),
            root,
            fr_scalar(wallet.nullifier_new),
            proof,
        )


def test_creation_attestation_negative(chain):
    session, alice, token_addr, shielder_addr, backend = chain
    tokens_fr = [scalar_fr(Scalar(token_addr.bytes)), 0]
    wallet = SnarkWallet.create(1, 2, 3, tokens_fr)
    att = CreationAttestation(99, wallet.trapdoor_new, wallet.nullifier_new)  # wrong id
    with pytest.raises(ZkpVerificationFail):
        session.call(shielder_addr, "add_note", fr_scalar(wallet.creation_note_hash()), att)
