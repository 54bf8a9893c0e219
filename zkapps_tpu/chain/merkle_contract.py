"""On-chain Merkle tree with the reference's exact storage semantics.

Behavioral twin of shielder/contract/merkle.rs: a 1-indexed implicit heap in a
sparse node mapping — leaves at [size, 2*size), root at node 1, missing nodes
defaulting to 0; every root after an insertion is logged into ``roots_log`` so
in-flight proofs against old roots stay valid (the protocol's
fault-tolerance mechanism, SURVEY.md §5).  ``gen_proof`` returns the DEPTH
siblings via the id^1 walk, and — faithfully to the reference — only fails
when the tree is already full (merkle.rs:89-102).

The hash function is injected so this same structure serves both the SHA256
mocked layer and the Poseidon SNARK layer.
"""

from __future__ import annotations

from typing import Callable

from ..mocked import Scalar, combine_merkle_hash
from .errors import MerkleTreeLimitExceeded, MerkleTreeNonExistingNode, MerkleTreeProofGenFail

ZERO = Scalar.from_u128(0)


class MerkleTree:
    def __init__(
        self,
        depth: int = 10,
        combine: Callable[[Scalar, Scalar], Scalar] = combine_merkle_hash,
    ):
        self.depth = depth
        self.size = 1 << depth
        self.nodes: dict[int, Scalar] = {}
        self.roots_log: set[Scalar] = set()
        self.next_leaf_idx = 0
        self.combine = combine

    def _node_value(self, idx: int) -> Scalar:
        if idx not in self.nodes:
            raise MerkleTreeNonExistingNode()
        return self.nodes[idx]

    def _node_or_zero(self, idx: int) -> Scalar:
        return self.nodes.get(idx, ZERO)

    def add_leaf(self, leaf_value: Scalar) -> int:
        if self.next_leaf_idx == self.size:
            raise MerkleTreeLimitExceeded()
        idx = self.next_leaf_idx + self.size
        cur_leaf_id = self.next_leaf_idx
        self.nodes[idx] = leaf_value
        idx //= 2
        while idx > 0:
            left = self._node_or_zero(2 * idx)
            right = self._node_or_zero(2 * idx + 1)
            self.nodes[idx] = self.combine(left, right)
            idx //= 2
        self.next_leaf_idx += 1
        self.roots_log.add(self.root())
        return cur_leaf_id

    def is_historical_root(self, root: Scalar) -> bool:
        return root in self.roots_log

    def gen_proof(self, leaf_id: int) -> list[Scalar]:
        # Reference quirk: errors only when the tree is FULL (merkle.rs:92-94).
        if self.next_leaf_idx == self.size:
            raise MerkleTreeProofGenFail()
        res = []
        idx = leaf_id + self.size
        for _ in range(self.depth):
            res.append(self._node_or_zero(idx ^ 1))
            idx //= 2
        return res

    def root(self) -> Scalar:
        return self._node_value(1)
