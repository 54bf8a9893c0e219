"""PSP22 fungible token (ERC20-like) — the cross-contract dependency.

Behavioral equivalent of the PSP22 trait surface the Shielder calls
(reference: shielder/contract/traits/psp22.rs — transfer / transfer_from /
approve / balance_of / allowance / total_supply).  The concrete token in the
reference lives in a git submodule; this is a standard implementation of the
same interface.
"""

from __future__ import annotations

from .errors import InsufficientAllowance, InsufficientBalance
from .session import AccountId, Env


class PSP22Token:
    def __init__(self, supply: int, owner: AccountId):
        self.balances: dict[bytes, int] = {owner.bytes: supply}
        self.allowances: dict[tuple[bytes, bytes], int] = {}
        self.supply = supply

    # -- views ---------------------------------------------------------
    def total_supply(self, env: Env) -> int:
        return self.supply

    def balance_of(self, env: Env, owner: AccountId) -> int:
        return self.balances.get(owner.bytes, 0)

    def allowance(self, env: Env, owner: AccountId, spender: AccountId) -> int:
        return self.allowances.get((owner.bytes, spender.bytes), 0)

    # -- mutations -----------------------------------------------------
    def transfer(self, env: Env, to: AccountId, value: int, _data: bytes = b"") -> None:
        self._move(env.caller, to, value)

    def transfer_from(
        self, env: Env, from_: AccountId, to: AccountId, value: int, _data: bytes = b""
    ) -> None:
        key = (from_.bytes, env.caller.bytes)
        allowance = self.allowances.get(key, 0)
        if allowance < value:
            raise InsufficientAllowance()
        self._move(from_, to, value)
        self.allowances[key] = allowance - value

    def approve(self, env: Env, spender: AccountId, value: int) -> None:
        self.allowances[(env.caller.bytes, spender.bytes)] = value

    def increase_allowance(self, env: Env, spender: AccountId, delta: int) -> None:
        key = (env.caller.bytes, spender.bytes)
        self.allowances[key] = self.allowances.get(key, 0) + delta

    def decrease_allowance(self, env: Env, spender: AccountId, delta: int) -> None:
        key = (env.caller.bytes, spender.bytes)
        cur = self.allowances.get(key, 0)
        if cur < delta:
            raise InsufficientAllowance()
        self.allowances[key] = cur - delta

    def _move(self, from_: AccountId, to: AccountId, value: int) -> None:
        fb = self.balances.get(from_.bytes, 0)
        if fb < value:
            raise InsufficientBalance()
        self.balances[from_.bytes] = fb - value
        self.balances[to.bytes] = self.balances.get(to.bytes, 0) + value
