"""In-process chain sandbox — the drink-sandbox analog (SURVEY.md §4 tier 3).

Provides what the reference's integration tests get from ``drink``: actor
switching, contract deployment at 32-byte addresses, cross-contract calls with
caller/callee tracking, and *transactional semantics* — a failed message
reverts all state it touched (critical for fidelity: the reference's
``update_note`` inserts the nullifier before verifying the proof and relies on
the chain rolling back on failure, contract/lib.rs:72-76).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass


@dataclass(frozen=True)
class AccountId:
    bytes: bytes

    def __post_init__(self):
        assert len(self.bytes) == 32

    @staticmethod
    def new(fill: int) -> "AccountId":
        return AccountId(bytes([fill] * 32))


class Env:
    """Per-call environment: who called, which contract is executing."""

    def __init__(self, session: "Session", caller: AccountId, callee: AccountId):
        self.session = session
        self.caller = caller
        self.callee = callee

    def cross_call(self, target: AccountId, method: str, *args, **kwargs):
        """Cross-contract call: the executing contract becomes the caller."""
        return self.session._dispatch(self.callee, target, method, args, kwargs)


class Session:
    def __init__(self):
        self.contracts: dict[bytes, object] = {}
        self.actor: AccountId | None = None
        self._next_addr = 0xA0  # auto-assigned contract addresses, clear of test actor ids

    def with_actor(self, actor: AccountId) -> "Session":
        self.actor = actor
        return self

    def deploy(self, contract: object, address: AccountId | None = None) -> AccountId:
        if address is None:
            address = AccountId.new(self._next_addr)
            self._next_addr += 1
        assert address.bytes not in self.contracts, "address already in use"
        self.contracts[address.bytes] = contract
        return address

    def contract_at(self, address: AccountId):
        return self.contracts[address.bytes]

    def call(self, address: AccountId, method: str, *args, **kwargs):
        """Top-level (extrinsic) call from the current actor, transactional."""
        assert self.actor is not None, "no actor selected"
        snapshot = copy.deepcopy(self.contracts)
        try:
            return self._dispatch(self.actor, address, method, args, kwargs)
        except Exception:
            self.contracts = snapshot  # rollback, like a failed extrinsic
            raise

    def _dispatch(self, caller: AccountId, callee: AccountId, method: str, args, kwargs):
        contract = self.contracts[callee.bytes]
        env = Env(self, caller, callee)
        return getattr(contract, method)(env, *args, **kwargs)
