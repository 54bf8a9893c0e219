"""Micro-profile of one MSM bucket-accumulation step: gather vs madd kernel.

Separates the per-step costs: (a) the pmadd pallas kernel alone on
pre-gathered operands, (b) the random gather of addend rows, (c) the full
fused step as the fori_loop body runs it.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from zkapps_tpu.fields.jnp_ops import FR, FQ, set_backend, set_unroll
from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.fields import pallas_ops as PO

set_unroll(False)
dev = jax.devices()[0]
if dev.platform != "cpu":
    set_backend("pallas")

n = 1 << 20
width = 16 * ((1 << 15) + 1)  # W * B at c=16

rng = np.random.default_rng(3)
g = G1.generator()
base = G1_JNP.encode([g.mul(i + 2) for i in range(64)])
pts = jnp.tile(base, (n // 64, 1, 1))  # (n,3,16) Z in {0,1}
pts_xy = pts[:, :2]

buckets = jnp.tile(base, (width // 64 + 1, 1, 1))[:width]
idx = jnp.asarray(rng.integers(0, n, size=(width,), dtype=np.int32))
flags = jnp.asarray(rng.integers(0, 2, size=(width,), dtype=np.uint32))


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms", file=sys.stderr)
    return out, dt


g1 = G1_JNP

qxy = pts_xy[idx]


@jax.jit
def kernel_only(bk, q, f):
    return g1.madd(bk, q, f > 0, f < 2)


@jax.jit
def gather_only(p, i):
    return p[i]


@jax.jit
def full_step(bk, p, i, f):
    q = p[i]
    return g1.madd(bk, q, f > 0, f < 2)


@jax.jit
def mul_only(a, b):
    return FQ.mul(a, b)


print(f"device={dev} width={width}", file=sys.stderr)
bench("pmadd kernel (pre-gathered)", kernel_only, buckets, qxy, flags)
bench("gather only", gather_only, pts_xy, idx)
bench("full step (gather+madd)", full_step, buckets, pts_xy, idx, flags)
a = buckets[:, 0, :]
b = buckets[:, 1, :]
_, dt = bench("field mul (width)", mul_only, a, b)
print(f"  -> mul: {width/dt/1e6:.1f} M muls/s", file=sys.stderr)
