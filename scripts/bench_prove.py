"""End-to-end Shielder update_note prove+verify wall-clock (BASELINE config 4).

Builds the real deposit relation (Poseidon custom gate, 2^12 domain), runs
keygen once, then times prove() and verify() on the local accelerator.
Fresh witness randomness per iteration (distinct circuits) so no dispatch
is elided.
"""

import json
import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "ZKTPU_COMPILE_CACHE",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from zkapps_tpu.fields.jnp_ops import set_backend, set_unroll
from zkapps_tpu.fields.host import Fr
from zkapps_tpu.hash import hash_host
from zkapps_tpu.pcs import get_srs
from zkapps_tpu.plonk import keygen, prove, verify
from zkapps_tpu.relations import (
    MerkleProofWitness,
    ShielderAccount,
    ShielderOpPriv,
    ShielderOpPub,
    build_update_note_circuit,
    merkle_path_shape,
)

P = Fr.p
DEPTH = 10
rng = random.Random(7)


def rand():
    return rng.randrange(P)


def host_merkle_root(leaf, path, leaf_id):
    cur, idx = leaf, leaf_id
    for sib in path:
        cur = hash_host([cur, sib]) if idx % 2 == 0 else hash_host([sib, cur])
        idx //= 2
    return cur


def build_witness():
    tokens = [rand(), rand()]
    user = rand()
    zk_id, trapdoor_old, nullifier_old = rand(), rand(), rand()
    trapdoor_new, nullifier_new = rand(), rand()
    old_account = ShielderAccount([(tokens[0], 500), (tokens[1], 300)])
    op_pub = ShielderOpPub(kind=0, amount=10, token=tokens[0], user=user)
    op_priv = ShielderOpPriv(user=user)
    new_account = old_account.update(op_pub)
    old_note = (zk_id, trapdoor_old, nullifier_old, old_account.hash())
    new_note = (zk_id, trapdoor_new, nullifier_new, new_account.hash())
    old_note_hash = hash_host(list(old_note))
    new_note_hash = hash_host(list(new_note))
    leaf_id = 3
    path = [rand() for _ in range(DEPTH)]
    merkle_root = host_merkle_root(old_note_hash, path, leaf_id)
    proof = MerkleProofWitness(merkle_path_shape(leaf_id, DEPTH), path)
    return dict(
        op_pub=op_pub,
        new_note_hash=new_note_hash,
        merkle_root=merkle_root,
        new_note=new_note,
        old_note=old_note,
        merkle_proof=proof,
        op_priv=op_priv,
        old_account=old_account,
    )


def main():
    set_unroll(False)
    dev = jax.devices()[0]
    if dev.platform != "cpu":
        set_backend("pallas")
    print(f"device={dev}", file=sys.stderr, flush=True)

    t0 = time.time()
    ctx = build_update_note_circuit(**build_witness())
    print(f"witness+circuit build {time.time()-t0:.2f}s", file=sys.stderr, flush=True)
    srs = get_srs(15)  # 2^12 domain x 8n quotient coset
    t0 = time.time()
    pk = keygen(ctx, srs)
    print(
        f"keygen (domain 2^{pk.log_n}) {time.time()-t0:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    t0 = time.time()
    proof = prove(pk, ctx, rng=random.Random(1))
    warm = time.time() - t0
    publics = [ctx.advice[c] % P for c in ctx.publics]
    assert verify(pk.vk, pk.kzg, proof, publics), "proof must verify"
    print(f"prove warm (incl compile) {warm:.1f}s", file=sys.stderr, flush=True)

    iters = int(os.environ.get("ITERS", "3"))
    times_p, times_v = [], []
    for i in range(iters):
        ctx_i = build_update_note_circuit(**build_witness())
        t0 = time.time()
        proof_i = prove(pk, ctx_i, rng=random.Random(i + 2))
        times_p.append(time.time() - t0)
        pubs_i = [ctx_i.advice[c] % P for c in ctx_i.publics]
        t0 = time.time()
        assert verify(pk.vk, pk.kzg, proof_i, pubs_i)
        times_v.append(time.time() - t0)
    tp = min(times_p)
    tv = min(times_v)
    print(
        f"prove steady {tp:.2f}s   verify {tv:.2f}s   proof {len(proof)} B",
        file=sys.stderr,
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "update_note_prove_s",
                "value": round(tp, 3),
                "unit": "s",
                "verify_s": round(tv, 3),
                "proof_bytes": len(proof),
                "domain_log2": pk.log_n,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
