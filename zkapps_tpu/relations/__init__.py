from .protocol import AccountModel, AccountLike, CircuitAccountLike, OpVec
from .shielder import (
    SHIELDER_MODEL,
    CircuitAccount,
    CircuitNote,
    MerkleProofWitness,
    ShielderAccount,
    ShielderOpPriv,
    ShielderOpPub,
    build_update_note_circuit,
    encode_scalar_to_fr,
    merkle_path_shape,
    update_account_circuit,
    verify_merkle_proof_circuit,
)

__all__ = [
    "AccountModel",
    "AccountLike",
    "CircuitAccountLike",
    "OpVec",
    "SHIELDER_MODEL",
    "CircuitNote",
    "CircuitAccount",
    "ShielderAccount",
    "ShielderOpPub",
    "ShielderOpPriv",
    "MerkleProofWitness",
    "build_update_note_circuit",
    "update_account_circuit",
    "verify_merkle_proof_circuit",
    "merkle_path_shape",
    "encode_scalar_to_fr",
]
