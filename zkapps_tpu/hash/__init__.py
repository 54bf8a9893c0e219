from .grain import GrainLFSR, generate_poseidon_constants
from .poseidon import (
    PADDING,
    R_F,
    R_P,
    RATE,
    T_WIDTH,
    PoseidonDevice,
    PoseidonHost,
    get_poseidon,
    hash_host,
    permute_host,
    poseidon_constants,
)
from .sha256 import combine_merkle_hash, sha256

__all__ = [
    "GrainLFSR",
    "generate_poseidon_constants",
    "PoseidonDevice",
    "PoseidonHost",
    "get_poseidon",
    "hash_host",
    "permute_host",
    "poseidon_constants",
    "T_WIDTH",
    "RATE",
    "R_F",
    "R_P",
    "PADDING",
    "sha256",
    "combine_merkle_hash",
]
