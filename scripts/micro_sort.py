"""Sort-cost microbenchmark: lax.sort with wide payloads at MSM scale.

If sorting (key, 64B-row) tuples streams fast on TPU, the MSM bucket loop can
be rebuilt around a step-major materialized layout with ZERO random gathers.
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

import functools

import jax.numpy as jnp
import numpy as np

N = 1 << int(os.environ.get("LOG_N", "24"))  # pairs = windows * points
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 20, size=(N,), dtype=np.int64).astype(np.uint32))
payload8 = jnp.asarray(rng.integers(0, 1 << 32, size=(N,), dtype=np.int64).astype(np.uint32))
rows = jnp.asarray(rng.integers(0, 1 << 32, size=(N, 16), dtype=np.int64).astype(np.uint32))


@jax.jit
def sort_kv(k, v):
    return jax.lax.sort((k, v), num_keys=1)


@jax.jit
def sort_k_row(k, r):
    cols = tuple(r[:, i] for i in range(16))
    out = jax.lax.sort((k,) + cols, num_keys=1)
    return out[0], jnp.stack(out[1:], axis=1)


@jax.jit
def argsort_then_gather(k, r):
    order = jnp.argsort(k)
    return k[order], r[order]


@jax.jit
def cummax_i32(k):
    return jax.lax.cummax(k.astype(jnp.int32), axis=0)


def bench(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:20s} {dt*1e3:9.2f} ms  ({dt/N*1e9:6.2f} ns/elt)", flush=True)


K_CHAIN = int(os.environ.get("K_CHAIN", "8"))


@jax.jit
def sort_chain_kv(k, v):
    def body(i, kv):
        kk, vv = jax.lax.sort((kv[0] ^ i.astype(jnp.uint32), kv[1]), num_keys=1)
        return (kk, vv)

    return jax.lax.fori_loop(0, K_CHAIN, body, (k, v))


@jax.jit
def sort_chain_row(k, r):
    def body(i, kr):
        kk, rr = kr
        cols = tuple(rr[:, j] for j in range(16))
        out = jax.lax.sort((kk ^ i.astype(jnp.uint32),) + cols, num_keys=1)
        return (out[0], jnp.stack(out[1:], axis=1))

    return jax.lax.fori_loop(0, K_CHAIN, body, (k, r))


@jax.jit
def gather_chain_row(k, r):
    def body(i, kr):
        kk, rr = kr
        order = jnp.argsort(kk ^ i.astype(jnp.uint32))
        return (kk[order], rr[order])

    return jax.lax.fori_loop(0, K_CHAIN, body, (k, r))


if __name__ == "__main__":
    print(f"device={jax.devices()[0]} N=2^{N.bit_length()-1}", flush=True)
    bench("sort k+4B", sort_kv, keys, payload8)
    bench("sort k+64B", sort_k_row, keys, rows)
    bench("argsort+gather64B", argsort_then_gather, keys, rows)
    bench("cummax", cummax_i32, keys)
    # chained variants: per-iteration dependency defeats any dedup/deferred
    # execution; divide by K_CHAIN for per-sort cost
    bench(f"chain{K_CHAIN} k+4B", sort_chain_kv, keys, payload8)
    bench(f"chain{K_CHAIN} k+64B", sort_chain_row, keys, rows)
    bench(f"chain{K_CHAIN} argsort+g", gather_chain_row, keys, rows)
