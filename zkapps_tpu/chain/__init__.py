from .contract import ShielderContract
from .errors import (
    ArithmeticError,
    InsufficientAllowance,
    InsufficientBalance,
    MerkleTreeLimitExceeded,
    MerkleTreeNonExistingNode,
    MerkleTreeProofGenFail,
    MerkleTreeVerificationFail,
    NullifierIsInSet,
    PSP22Error,
    ShielderError,
    ZkpVerificationFail,
)
from .merkle_contract import MerkleTree
from .psp22 import PSP22Token
from .session import AccountId, Env, Session

__all__ = [
    "ShielderContract",
    "MerkleTree",
    "PSP22Token",
    "AccountId",
    "Env",
    "Session",
    "ShielderError",
    "PSP22Error",
    "InsufficientBalance",
    "InsufficientAllowance",
    "NullifierIsInSet",
    "MerkleTreeVerificationFail",
    "MerkleTreeLimitExceeded",
    "MerkleTreeProofGenFail",
    "MerkleTreeNonExistingNode",
    "ZkpVerificationFail",
    "ArithmeticError",
]
