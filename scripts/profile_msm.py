"""Per-phase MSM profiling on the local accelerator.

Times digits+sort, bucket accumulation, suffix-scan reduction, and window
combine separately so optimization effort lands on the dominant phase.
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
from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.msm import jnp_msm as M

log_n = int(os.environ.get("LOG_N", "20"))
c = int(os.environ.get("WINDOW", "16"))
n = 1 << log_n

set_unroll(False)
dev = jax.devices()[0]
if dev.platform != "cpu":
    set_backend("pallas")
print(f"device={dev} n=2^{log_n} c={c}", file=sys.stderr)

base_n = 1 << 10
g = G1.generator()
base_pts = G1_JNP.encode([g.mul(3 * i + 2) for i in range(64)])
base_pts = jnp.tile(base_pts, (base_n // 64, 1, 1))
points = jnp.tile(base_pts, (n // base_n, 1, 1))
rng = np.random.default_rng(7)
scal_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint16).astype(np.uint32)
scal_np[:, 15] &= 0x2FFF
scalars = jnp.asarray(scal_np)

g1 = G1_JNP


@jax.jit
def phase_digits(scalars):
    return M.signed_digits(scalars, c)


@jax.jit
def phase_sort(points, ids, negs):
    """The sort/searchsorted/rank prologue of _bucket_accumulate_all, alone."""
    n_ = points.shape[0]
    n_win = ids.shape[0]
    b = (1 << (c - 1)) + 1
    width = n_win * b
    pt_inf = g1.f.is_zero(points[:, 2])
    win_off = jnp.arange(n_win, dtype=jnp.int32)[:, None] * b
    gids = ids + win_off
    gids = jnp.where(pt_inf[None, :], win_off, gids).reshape(-1)
    pt_idx = jnp.broadcast_to(jnp.arange(n_, dtype=jnp.uint32)[None], (n_win, n_))
    rec = (pt_idx | (negs.astype(jnp.uint32) << 31)).reshape(-1)
    sorted_gid, sorted_rec = jax.lax.sort((gids, rec), num_keys=1)
    bucket_range = jnp.arange(width, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_gid, bucket_range)
    end = jnp.searchsorted(sorted_gid, bucket_range, side="right")
    is_real = (bucket_range % b) != 0
    count = jnp.where(is_real, end - start, 0)
    rank = jnp.argsort(-count)
    return sorted_rec, count[rank], start[rank]


@jax.jit
def phase_buckets(points, ids, negs):
    return M._bucket_accumulate_all(g1, points, ids, negs, c)


@jax.jit
def phase_reduce(buckets):
    return M.window_sums_of(buckets)


@jax.jit
def phase_combine(wsums):
    return M._window_combine(g1, wsums, c)


def bench(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:12s} {dt*1e3:9.1f} ms", file=sys.stderr)
    return out, dt


(ids, negs), t1 = bench("digits", phase_digits, scalars)
_, t_sort = bench("sort-only", phase_sort, points, ids, negs)
buckets, t2 = bench("buckets", phase_buckets, points, ids, negs)
wsums, t3 = bench("reduce", phase_reduce, buckets)
acc, t4 = bench("combine", phase_combine, wsums)
tot = t1 + t2 + t3 + t4
print(f"{'TOTAL':12s} {tot*1e3:9.1f} ms -> {n/tot:,.0f} points/s", file=sys.stderr)
