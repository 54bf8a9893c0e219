"""Raw VPU op-rate microbenchmark inside a Mosaic kernel.

Measures u32 multiply / add / mixed throughput on (16, T) tiles to locate the
Montgomery-mul kernel's distance from speed-of-light, and tests whether
16-bit-valued operands admit a cheaper multiply path.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << int(os.environ.get("LOG_N", "20"))
K = int(os.environ.get("K", "256"))  # ops per element per kernel pass
TILE = int(os.environ.get("TILE", "1024"))
ROWS = 16


def make_kernel(body):
    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[:].T
        b = b_ref[:].T
        out_ref[:] = body(a, b).T

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, ROWS), jnp.uint32),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(a, b)

    return run


def body_mul(a, b):
    acc = a
    for _ in range(K):
        acc = acc * b
    return acc


def body_mul16(a, b):
    # operands masked to 16 bits each round — can Mosaic exploit narrow values?
    acc = a
    for _ in range(K):
        acc = (acc & 0xFFFF) * (b & 0xFFFF)
    return acc


def body_add(a, b):
    acc = a
    for _ in range(K):
        acc = acc + b
    return acc


def body_mulhi(a, b):
    acc = a
    for _ in range(K):
        acc = (acc * b) >> 16
    return acc


def bench(name, body, iters=10):
    run = make_kernel(body)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(N, ROWS), dtype=np.int64).astype(np.uint32))
    b = jnp.asarray(rng.integers(1, 1 << 16, size=(N, ROWS), dtype=np.int64).astype(np.uint32))
    out = run(a, b)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = run(a, b)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    ops = N * ROWS * K
    print(f"{name:10s} {dt*1e3:8.2f} ms   {ops/dt/1e9:8.1f} Gop/s", flush=True)


if __name__ == "__main__":
    print(f"device={jax.devices()[0]} N=2^{N.bit_length()-1} K={K} tile={TILE}", flush=True)
    bench("add", body_add)
    bench("mul", body_mul)
    bench("mul16", body_mul16)
    bench("mulhi", body_mulhi)
    # no f32 variant: Mosaic cannot lower uint32 -> float32 casts in-kernel
    # (NotImplementedError in pallas/mosaic/lowering), so an f32 mul chain
    # isn't expressible here without integer bit tricks that defeat the point.
