"""Bucket-step microbenchmark: fori_loop-chained pmadd, +/- gather.

Mirrors _bucket_accumulate_all's inner loop exactly: K steps, each one
(optionally) an XLA row gather of packed addends followed by the masked
packed mixed-add kernel over a fixed width.  Separates kernel throughput
from gather cost without per-dispatch noise.
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

from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.fields import pallas_ops as P
from zkapps_tpu.fields.jnp_ops import FQ

WIDTH = 1 << int(os.environ.get("LOG_W", "19"))
K = int(os.environ.get("K", "32"))
TILE = int(os.environ.get("TILE", "1024"))
TOTAL = WIDTH * 16  # gather source size (like n * windows)

g1 = G1_JNP
g = G1.generator()
base = g1.encode([g.mul(3 * i + 2) for i in range(64)])
pts0 = jnp.tile(base, (WIDTH // 64, 1, 1))
src = jnp.tile(g1.pack_affine(base[:, :2]), (TOTAL // 64, 1))
rng = np.random.default_rng(0)
idx_all = jnp.asarray(rng.integers(0, TOTAL, size=(K, WIDTH), dtype=np.int64).astype(np.int32))
flags = jnp.zeros((WIDTH,), jnp.uint32)


@functools.partial(jax.jit, static_argnums=(3,))
def loop_gather_madd(pts, src_pk, idx_all, k):
    def step(i, acc):
        rows = src_pk[idx_all[i]]
        return P.pmadd_packed_pallas(acc, rows, flags[:, None], FQ.p, FQ.n0inv, TILE)

    return jax.lax.fori_loop(0, k, step, pts)


@functools.partial(jax.jit, static_argnums=(2,))
def loop_madd(pts, rows0, k):
    def step(i, acc):
        return P.pmadd_packed_pallas(acc, rows0, flags[:, None], FQ.p, FQ.n0inv, TILE)

    return jax.lax.fori_loop(0, k, step, pts)


@functools.partial(jax.jit, static_argnums=(2,))
def loop_gather_only(src_pk, idx_all, k):
    def step(i, acc):
        rows = src_pk[idx_all[i]]
        return (acc + rows) & 0xFFFF

    return jax.lax.fori_loop(0, k, step, jnp.zeros((WIDTH, 16), jnp.uint32))


def bench(name, fn, *args, iters=3, rows=WIDTH * K):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:14s} {dt*1e3:8.2f} ms   {dt/rows*1e9:6.2f} ns/row", flush=True)


if __name__ == "__main__":
    print(f"device={jax.devices()[0]} width=2^{WIDTH.bit_length()-1} K={K} tile={TILE}", flush=True)
    rows0 = src[idx_all[0]]
    bench("madd-only", loop_madd, pts0, rows0, K)
    bench("gather-only", loop_gather_only, src, idx_all, K)
    bench("gather+madd", loop_gather_madd, pts0, src, idx_all, K)
