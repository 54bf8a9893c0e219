"""Microbenchmark: masked mixed-add Pallas kernel throughput vs tile size.

The MSM bucket-accumulate loop is >90% of MSM time (scripts/profile_msm.py),
and each step is one pmadd_pallas launch over the active bucket prefix plus
an XLA row gather of the addends — this isolates the kernel so layout/tile
changes can be measured in ~a minute instead of recompiling the whole MSM.
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

from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.fields.jnp_ops import FQ
from zkapps_tpu.fields import pallas_ops as P

n = 1 << int(os.environ.get("LOG_N", "19"))
g = G1.generator()
base = G1_JNP.encode([g.mul(3 * i + 2) for i in range(64)])
pts = jnp.tile(base, (n // 64, 1, 1))
qxy = jnp.tile(base[:, :2], (n // 64, 1, 1))
flags = jnp.zeros((n, 1), jnp.uint32)
gather_idx = jnp.asarray(np.random.default_rng(0).permutation(n).astype(np.int32))

for tile in (512, 1024, 2048, 4096):
    fn = jax.jit(lambda p_, q_, f_: P.pmadd_pallas(p_, q_, f_, FQ.p, FQ.n0inv, tile))
    out = fn(pts, qxy, flags)
    jax.block_until_ready(out)
    t0 = time.time()
    iters = 20
    for _ in range(iters):
        out = fn(pts, out[:, :2], flags)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(
        f"tile={tile:5d}  {dt*1e3:7.2f} ms  {n/dt/1e6:8.2f} Madd/s  "
        f"{n*11/dt/1e6:8.1f} Mmul/s",
        flush=True,
    )

# gather + madd (the real per-step shape: XLA row gather feeding the kernel)
tile = int(os.environ.get("TILE", "1024"))


@jax.jit
def step(p_, q_, f_, idx):
    qg = q_[idx]
    return P.pmadd_pallas(p_, qg, f_, FQ.p, FQ.n0inv, tile)


out = step(pts, qxy, flags, gather_idx)
jax.block_until_ready(out)
t0 = time.time()
iters = 20
for _ in range(iters):
    out = step(out, qxy, flags, gather_idx)
jax.block_until_ready(out)
dt = (time.time() - t0) / iters
print(f"gather+madd tile={tile}: {dt*1e3:7.2f} ms  ({n/dt/1e6:.2f} Madd/s)", flush=True)
