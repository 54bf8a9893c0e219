"""Shielder contract error taxonomy (reference: shielder/contract/errors.rs)."""

from __future__ import annotations


class ShielderError(Exception):
    pass


class PSP22Error(ShielderError):
    pass


class InsufficientBalance(PSP22Error):
    pass


class InsufficientAllowance(PSP22Error):
    pass


class NullifierIsInSet(ShielderError):
    pass


class MerkleTreeVerificationFail(ShielderError):
    pass


class MerkleTreeLimitExceeded(ShielderError):
    pass


class MerkleTreeProofGenFail(ShielderError):
    pass


class MerkleTreeNonExistingNode(ShielderError):
    pass


class ZkpVerificationFail(ShielderError):
    pass


class ArithmeticError(ShielderError):
    pass
