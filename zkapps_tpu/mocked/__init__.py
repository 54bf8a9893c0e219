"""Mocked proving layer — behavioral twin of the reference's ``mocked_zk`` crate.

The reference architects its app so a plaintext "proof of knowledge" can stand
in for the SNARK (SURVEY.md §0 L3): the ZkProof object *is* the witness, and
"verification" recomputes the statement in plaintext.  This module reproduces
that layer exactly — including its quirks — so the chain sim and scenario tests
match the reference bit-for-bit:

- Scalar: opaque 32 bytes, LE u128 conversions (mocked_zk/src/scalar.rs)
- Note: SHA256 of the 4x32-byte concat (mocked_zk/src/note.rs:26-40)
- Account: balances[(token, balance); 2]; ``hash()`` loops i in 1..TOKENS_NUMBER
  overwriting the digest — effectively SHA256 of the LAST token's balance only.
  This quirk is preserved deliberately (mocked_zk/src/account.rs:17-24).
- ZkProof: verify_creation / verify_update / update_account / transition
  (mocked_zk/src/relations.rs)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..hash.sha256 import sha256

MERKLE_TREE_DEPTH = 10
TOKENS_NUMBER = 2

U128_MAX = (1 << 128) - 1


class ZkpError(Exception):
    pass


class AccountUpdateError(ZkpError):
    pass


class OperationCombineError(ZkpError):
    pass


class VerificationError(ZkpError):
    pass


@dataclass(frozen=True)
class Scalar:
    """Opaque 256-bit on-chain value (mocked_zk/src/scalar.rs)."""

    bytes: bytes = b"\x00" * 32

    def __post_init__(self):
        assert len(self.bytes) == 32

    @staticmethod
    def from_bytes(b: bytes) -> "Scalar":
        return Scalar(bytes(b))

    @staticmethod
    def from_u128(v: int) -> "Scalar":
        assert 0 <= v <= U128_MAX
        return Scalar(v.to_bytes(16, "little") + b"\x00" * 16)

    def to_u128(self) -> int:
        return int.from_bytes(self.bytes[:16], "little")


ZERO = Scalar.from_u128(0)
MOCKED_TOKEN = Scalar(bytes([228] * 32))


def mocked_user() -> Scalar:
    return Scalar.from_u128(1)


def combine_merkle_hash(first: Scalar, second: Scalar) -> Scalar:
    """SHA256(first || second) (mocked_zk/src/lib.rs:24-28)."""
    return Scalar(sha256(first.bytes + second.bytes))


@dataclass(frozen=True)
class Note:
    """(id, trapdoor, nullifier, account_hash) (mocked_zk/src/note.rs)."""

    id: Scalar
    trapdoor: Scalar
    nullifier: Scalar
    account_hash: Scalar

    def hash(self) -> Scalar:
        return Scalar(
            sha256(
                self.id.bytes + self.trapdoor.bytes + self.nullifier.bytes + self.account_hash.bytes
            )
        )


@dataclass(frozen=True)
class OpPub:
    """Public operation half (mocked_zk/src/ops.rs:6-26)."""

    kind: str  # "deposit" | "withdraw"
    amount: int  # u128
    token: Scalar
    user: Scalar


@dataclass(frozen=True)
class OpPriv:
    user: Scalar


@dataclass(frozen=True)
class Operation:
    op_pub: OpPub
    op_priv: OpPriv

    @staticmethod
    def combine(op_pub: OpPub, op_priv: OpPriv) -> "Operation":
        if op_pub.user != op_priv.user:
            raise OperationCombineError()
        return Operation(op_pub, op_priv)


@dataclass(frozen=True)
class Account:
    """Private token balances (mocked_zk/src/account.rs)."""

    balances: tuple[tuple[Scalar, Scalar], ...]  # ((token, balance); TOKENS_NUMBER)

    @staticmethod
    def new(tokens: list[Scalar]) -> "Account":
        assert len(tokens) == TOKENS_NUMBER
        return Account(tuple((t, ZERO) for t in tokens))

    def hash(self) -> Scalar:
        # Reference quirk (account.rs:17-24): the loop starts at 1 and
        # overwrites, so the digest is SHA256 of the last balance only.
        res = b"\x00" * 32
        for i in range(1, TOKENS_NUMBER):
            res = sha256(self.balances[i][1].bytes)
        return Scalar(res)

    def update(self, operation: Operation) -> "Account":
        op = operation.op_pub
        for i, (token, balance) in enumerate(self.balances):
            if token == op.token:
                cur = balance.to_u128()
                if op.kind == "deposit":
                    upd = cur + op.amount
                    if upd > U128_MAX:
                        raise AccountUpdateError()
                else:
                    upd = cur - op.amount
                    if upd < 0:
                        raise AccountUpdateError()
                new_balances = list(self.balances)
                new_balances[i] = (token, Scalar.from_u128(upd))
                return Account(tuple(new_balances))
        raise AccountUpdateError()


def verify_hash(obj, h: Scalar) -> Scalar:
    real = obj.hash()
    if real != h:
        raise VerificationError()
    return real


@dataclass(frozen=True)
class ZkProof:
    """The witness-as-proof (mocked_zk/src/relations.rs:16-26)."""

    id: Scalar
    trapdoor_new: Scalar
    trapdoor_old: Scalar
    nullifier_new: Scalar
    acc_old: Account
    acc_new: Account
    op_priv: OpPriv
    merkle_proof: tuple[Scalar, ...] = field(default_factory=lambda: (ZERO,) * MERKLE_TREE_DEPTH)
    merkle_proof_leaf_id: int = 0

    @staticmethod
    def new(id: Scalar, trapdoor: Scalar, nullifier: Scalar, op_priv: OpPriv, acc: Account):
        return ZkProof(
            id=id,
            trapdoor_new=trapdoor,
            trapdoor_old=ZERO,
            nullifier_new=nullifier,
            acc_old=acc,
            acc_new=acc,
            op_priv=op_priv,
        )

    def _transition(self, trapdoor, nullifier, acc, op_priv, merkle_proof, leaf_id):
        return ZkProof(
            id=self.id,
            trapdoor_new=trapdoor,
            trapdoor_old=self.trapdoor_new,
            nullifier_new=nullifier,
            acc_new=acc,
            acc_old=self.acc_new,
            op_priv=op_priv,
            merkle_proof=tuple(merkle_proof),
            merkle_proof_leaf_id=leaf_id,
        )

    def update_account(
        self,
        operation: Operation,
        trapdoor: Scalar,
        nullifier: Scalar,
        merkle_proof: list[Scalar],
        merkle_proof_leaf_id: int,
    ) -> tuple[Scalar, "ZkProof"]:
        """Client-side 'proving': roll the witness forward (relations.rs:79-98)."""
        acc_updated = self.acc_new.update(operation)
        note = Note(self.id, trapdoor, nullifier, acc_updated.hash())
        new_proof = self._transition(
            trapdoor, nullifier, acc_updated, operation.op_priv, merkle_proof, merkle_proof_leaf_id
        )
        return note.hash(), new_proof

    def verify_account_update(self, op: Operation, h_acc_old: Scalar) -> Account:
        acc_new = self.acc_old.update(op)
        verify_hash(self.acc_old, h_acc_old)
        return acc_new

    def _verify_merkle_proof(self, h_note_old: Scalar, merkle_root: Scalar) -> None:
        id_ = self.merkle_proof_leaf_id
        scalar = h_note_old
        for node in self.merkle_proof:
            if id_ % 2 == 0:
                scalar = combine_merkle_hash(scalar, node)
            else:
                scalar = combine_merkle_hash(node, scalar)
            id_ //= 2
        if scalar != merkle_root:
            raise VerificationError()

    def verify_creation(self, h_note_new: Scalar, tokens_list: list[Scalar]) -> None:
        h_acc_new = Account.new(tokens_list).hash()
        note_new = Note(self.id, self.trapdoor_new, self.nullifier_new, h_acc_new)
        verify_hash(note_new, h_note_new)

    def verify_update(
        self, op_pub: OpPub, h_note_new: Scalar, merkle_root: Scalar, nullifier_old: Scalar
    ) -> None:
        h_acc_old = self.acc_old.hash()
        op = Operation.combine(op_pub, self.op_priv)
        acc_new = self.verify_account_update(op, h_acc_old)
        h_acc_new = acc_new.hash()
        note_new = Note(self.id, self.trapdoor_new, self.nullifier_new, h_acc_new)
        verify_hash(note_new, h_note_new)
        note_old = Note(self.id, self.trapdoor_old, nullifier_old, h_acc_old)
        self._verify_merkle_proof(note_old.hash(), merkle_root)
