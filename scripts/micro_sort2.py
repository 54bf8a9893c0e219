"""Sort cost with forced host materialization + varying inputs per call."""

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

N = 1 << int(os.environ.get("LOG_N", "22"))
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 20, size=(N,), dtype=np.int64).astype(np.uint32))
rows = jnp.asarray(rng.integers(0, 1 << 32, size=(N, 16), dtype=np.int64).astype(np.uint32))


@jax.jit
def sort_k_row(k, r, salt):
    cols = tuple(r[:, j] for j in range(16))
    out = jax.lax.sort((k ^ salt,) + cols, num_keys=1)
    return out[0][::65537].sum() + out[3][::65537].sum()


@jax.jit
def baseline_touch(k, r, salt):
    return (k ^ salt)[::65537].sum() + r[:, 2][::65537].sum()


def bench(name, fn, iters=5):
    out = fn(keys, rows, jnp.uint32(123))
    _ = np.asarray(out)
    t0 = time.time()
    acc = 0
    for i in range(iters):
        out = fn(keys, rows, jnp.uint32(i))
        acc += int(np.asarray(out))  # host round-trip forces execution
    dt = (time.time() - t0) / iters
    print(f"{name:16s} {dt*1e3:9.2f} ms  ({dt/N*1e9:6.2f} ns/elt)  [{acc & 0xFF}]", flush=True)


if __name__ == "__main__":
    print(f"device={jax.devices()[0]} N=2^{N.bit_length()-1}", flush=True)
    bench("touch-only", baseline_touch)
    bench("sort k+64B", sort_k_row)
