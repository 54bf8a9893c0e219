"""Generic Account/Operation extension protocol.

Mirror of the reference relation crate's extension traits
(`/root/reference/shielder/relations/src/account.rs:8-21` and
`operation.rs:3-23`): the update_note relation is generic over an account
family — native account type, its circuit twin, and the public/private
operation halves — so a new application can plug its own state-transition
semantics into the SAME note/merkle/nullifier relation.

Rust trait -> Python mapping:

  Operation::{OpPriv, OpPub}: Into<Vec<F>>   -> objects with ``to_vec()``
  Operation::combine(priv, pub) -> Option    -> AccountModel.circuit_combine
     (the in-circuit half, CircuitOperation::combine: constrains the halves'
     consistency and returns the combined op cells, or raises)
  Account::{update, load}                    -> objects with ``update(op)``,
     ``to_vec()``, ``hash()``; loading is AccountModel.load
  CircuitAccount::update(op, ctx, gate)      -> circuit-account objects with
     ``update(gate, op_cells)`` and ``to_vec()``

``AccountModel`` bundles the family (the Rust associated types) as first-
class values; relations take a model and stay account-agnostic.  See
relations.shielder.SHIELDER_MODEL for the concrete 2-token instance and
tests/test_relations.py for a second (toy) instance proving through the
same relation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Protocol, Sequence, runtime_checkable

from ..circuit import AssignedValue, Context, GateChip


@runtime_checkable
class OpVec(Protocol):
    """Operation half (public or private): Into<Vec<F>> (operation.rs:8-9)."""

    def to_vec(self) -> list[int]: ...


@runtime_checkable
class AccountLike(Protocol):
    """Native account (account.rs:8-15 + CloneToVec)."""

    def to_vec(self) -> list[int]: ...

    def hash(self) -> int: ...

    def update(self, op: Any) -> "AccountLike": ...


@runtime_checkable
class CircuitAccountLike(Protocol):
    """In-circuit account twin (account.rs:17-21 + CloneToVec)."""

    def to_vec(self) -> list[AssignedValue]: ...

    def update(self, gate: GateChip, op_cells: Sequence[AssignedValue]) -> "CircuitAccountLike": ...


@dataclass(frozen=True)
class AccountModel:
    """The account family as a value (the Rust associated-type bundle).

    load:            Account::load — native account -> circuit account
    circuit_combine: CircuitOperation::combine — constrain the private and
                     public operation halves' consistency in-circuit and
                     return the combined operation cells fed to
                     CircuitAccount::update (None-on-mismatch in Rust maps
                     to an unsatisfiable constraint here).
    """

    load: Callable[[Context, Any], CircuitAccountLike]
    circuit_combine: Callable[
        [GateChip, Sequence[AssignedValue], Sequence[AssignedValue]],
        Sequence[AssignedValue],
    ]
