"""SHA256 helpers matching the mocked_zk / contract hashing conventions.

The reference's mock layer and on-chain Merkle tree hash raw 32-byte scalar
encodings with SHA256 (shielder/mocked_zk/src/lib.rs:24-28,
shielder/contract/merkle.rs:24-28, mocked_zk/src/note.rs:26-40).  These are
host-side (chain-sim) operations; hashlib is the natural implementation.
"""

from __future__ import annotations

import hashlib


def sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def combine_merkle_hash(first: bytes, second: bytes) -> bytes:
    """SHA256(first || second) — merkle.rs compute_hash / lib.rs combine_merkle_hash."""
    return sha256(first + second)
