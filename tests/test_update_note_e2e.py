"""Flagship relation end-to-end: update_note proven + verified by the REAL
PLONK stack (KZG + Poseidon custom gate, 2^12 domain) — the in-tree analog
of the reference's update_note proving flow
(/root/reference/shielder/relations/src/relations/update_note.rs:106-148).

Slow on XLA:CPU (one full 2^12-domain prove) — gated behind
ZKTPU_SLOW_TESTS=1 like the other heavyweight suites; the TPU bench script
(scripts/bench_prove.py) exercises the same path on hardware every round.
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ZKTPU_SLOW_TESTS"),
    reason="full 2^12-domain prove; set ZKTPU_SLOW_TESTS=1",
)


def test_update_note_prove_verify_e2e():
    from tests.test_relations import build_full_witness
    from zkapps_tpu.fields import Fr
    from zkapps_tpu.pcs import get_srs
    from zkapps_tpu.plonk import check_circuit, keygen, prove, verify
    from zkapps_tpu.relations import build_update_note_circuit

    witness, nullifier_old = build_full_witness(kind=1, amount=77)
    ctx = build_update_note_circuit(**witness)
    check_circuit(ctx)
    pk = keygen(ctx, get_srs(13))
    assert pk.vk.poseidon and pk.n == 1 << 12
    proof = prove(pk, ctx, debug_checks=True, rng=random.Random(3))
    publics = [ctx.advice[c] % Fr.p for c in ctx.publics]
    assert publics[-1] == nullifier_old
    assert verify(pk.vk, pk.kzg, proof, publics)
    # tampered public (wrong nullifier) must reject
    bad = list(publics)
    bad[-1] = (bad[-1] + 1) % Fr.p
    assert not verify(pk.vk, pk.kzg, proof, bad)
    # tampered proof byte must reject
    flipped = bytearray(proof)
    flipped[100] ^= 1
    assert not verify(pk.vk, pk.kzg, bytes(flipped), publics)
