"""Native (C++) witness runtime vs the Python implementations."""

import random

import pytest

from zkapps_tpu import native
from zkapps_tpu.fields import Fr
from zkapps_tpu.hash import hash_host
from zkapps_tpu.mocked import Scalar

random.seed(17)

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_fr_mulmod():
    for _ in range(20):
        a, b = random.randrange(Fr.p), random.randrange(Fr.p)
        assert native.fr_mulmod(a, b) == a * b % Fr.p
    assert native.fr_mulmod(Fr.p - 1, Fr.p - 1) == (Fr.p - 1) * (Fr.p - 1) % Fr.p
    assert native.fr_mulmod(0, 123) == 0


def test_poseidon_hash_batch_matches_python():
    for length in (1, 2, 4, 5, 8):
        rows = [[random.randrange(Fr.p) for _ in range(length)] for _ in range(5)]
        assert native.poseidon_hash_batch(rows) == [hash_host(r) for r in rows], length


def test_merkle_build_matches_contract_tree():
    """Native bulk build == incremental contract tree with Poseidon combine."""
    from zkapps_tpu.chain.merkle_contract import MerkleTree
    from zkapps_tpu.chain.snark import fr_scalar, poseidon_combine, scalar_fr

    depth = 5
    n = 11
    leaves = [random.randrange(Fr.p) for _ in range(n)]
    tree = MerkleTree(depth, combine=poseidon_combine)
    for v in leaves:
        tree.add_leaf(fr_scalar(v))
    nodes = native.merkle_build(leaves, depth)
    assert nodes[1] == scalar_fr(tree.root())
    # paths agree as well
    size = 1 << depth
    for leaf_id in (0, 3, n - 1):
        path = [scalar_fr(s) for s in tree.gen_proof(leaf_id)]
        idx = leaf_id + size
        native_path = []
        for _ in range(depth):
            native_path.append(nodes[idx ^ 1])
            idx //= 2
        assert native_path == path


def test_merkle_build_empty_and_full():
    depth = 4
    assert native.merkle_build([], depth)[1] == 0  # no leaves -> missing root
    leaves = [random.randrange(Fr.p) for _ in range(1 << depth)]
    nodes = native.merkle_build(leaves, depth)
    expect = leaves[:]
    level = expect
    while len(level) > 1:
        level = [hash_host([level[i], level[i + 1]]) for i in range(0, len(level), 2)]
    assert nodes[1] == level[0]
