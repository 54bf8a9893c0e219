"""Batched-Poseidon / Merkle-build throughput: VPU mul/add MDS vs MXU matmul.

BASELINE.md config 1 is hash throughput (the witness-gen / Merkle-build
path).  This bench builds one level of a large Merkle tree — B 2-ary
Poseidon node hashes, each = one T=5 permutation — with the classic
``_mix`` (T*T batched limb muls/round) and the ``mxu`` nibble-matmul MDS,
and prints hashes/s for both.  Full-pipeline timing with varied inputs (the
axon tunnel elides repeated identical dispatches; NOTES.md).

Env: LOG_B (default 18) batch size; ITERS (default 3).
"""

import os
import pathlib
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

import jax.numpy as jnp
import numpy as np

from zkapps_tpu.fields.jnp_ops import FR, set_backend, set_unroll
from zkapps_tpu.hash.poseidon import PoseidonDevice, hash_host

log_b = int(os.environ.get("LOG_B", "18"))
iters = int(os.environ.get("ITERS", "3"))
b = 1 << log_b

# unrolled straight-line field ops fuse into few kernels on TPU (the looped
# mode round-trips HBM per limb iteration); scan over rounds keeps the
# graph small either way
set_unroll(os.environ.get("ZKTPU_BENCH_UNROLL", "1") == "1")
dev = jax.devices()[0]
if dev.platform != "cpu":
    set_backend("pallas")
print(f"device={dev} B=2^{log_b} (2-ary node hashes)", file=sys.stderr)

rng = np.random.default_rng(11)
pairs_np = rng.integers(0, 1 << 16, size=(b, 2, 16), dtype=np.int64).astype(np.uint32)
pairs_np[:, :, 15] &= 0x2FFF
pairs = jnp.asarray(pairs_np)


def run(tag: str, mxu: bool):
    pos = PoseidonDevice(FR, mxu=mxu)
    fn = jax.jit(pos.hash_fixed)
    out = fn(pairs)
    jax.block_until_ready(out)
    # correctness spot check vs host sponge
    got = FR.decode(out[:2])
    want = [hash_host(FR.decode(pairs[i])) for i in range(2)]
    assert got == want, f"{tag}: device hash != host"
    variants = [pairs.at[0, 0, 0].set(i) for i in range(iters)]
    t0 = time.time()
    outs = [fn(v) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{tag:8s} {dt*1e3:9.1f} ms -> {b/dt:,.0f} hashes/s", file=sys.stderr)
    return b / dt


classic = run("classic", mxu=False)
mxu = run("mxu", mxu=True)
print(f"speedup {mxu/classic:.2f}x", file=sys.stderr)
import json

print(json.dumps({"metric": f"poseidon_hashes_per_s_2^{log_b}", "classic": round(classic), "mxu": round(mxu), "speedup": round(mxu / classic, 2)}))
