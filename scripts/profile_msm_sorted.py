"""Per-phase profiling of the production (sorted-scheme) MSM.

Times: digit split, the sort/table prologue of _bucket_accumulate_sorted,
full bucket accumulation (prologue + slab loop), window reduction, and the
Horner combine — so optimization effort lands on the dominant phase.
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

from zkapps_tpu.fields.jnp_ops import set_backend, set_unroll
from zkapps_tpu.fields.limbs import N_LIMBS, LIMB_BITS
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
print(f"device={dev} n=2^{log_n} c={c} SLAB_R={M.SLAB_R}", file=sys.stderr)

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
def phase_prologue(points, ids, negs):
    """Everything in _bucket_accumulate_sorted before the slab loop."""
    f = g1.f
    n_ = points.shape[0]
    n_win = ids.shape[0]
    b = (1 << (c - 1)) + 1
    width = n_win * b
    h = N_LIMBS // 2
    pts_pk = g1.pack_affine(points[:, :2])
    yw = pts_pk[:, h:]
    y = jnp.concatenate([yw & 0xFFFF, yw >> LIMB_BITS], axis=-1)
    ny = f.sub(jnp.zeros_like(y), y)
    nyw = ny[:, :h] | (ny[:, h:] << LIMB_BITS)
    pts_pk_neg = jnp.concatenate([pts_pk[:, :h], nyw], axis=-1)
    pt_inf = f.is_zero(points[:, 2])
    win_off = jnp.arange(n_win, dtype=jnp.int32)[:, None] * b
    gids = ids + win_off
    gids = jnp.where(pt_inf[None, :], win_off, gids).reshape(-1)
    rows0 = jnp.where(
        negs.reshape(-1)[:, None],
        jnp.tile(pts_pk_neg, (n_win, 1)),
        jnp.tile(pts_pk, (n_win, 1)),
    )
    srt1 = jax.lax.sort((gids,) + tuple(rows0[:, j] for j in range(N_LIMBS)), num_keys=1)
    sorted_gid = srt1[0]
    total = n_win * n_
    idx = jnp.arange(total, dtype=jnp.int32)
    brk = sorted_gid[1:] != sorted_gid[:-1]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), brk])
    end_seg = jnp.concatenate([brk, jnp.ones((1,), bool)])
    first = jax.lax.cummax(jnp.where(new_seg, idx, 0))
    last = jax.lax.cummin(jnp.where(end_seg, idx, jnp.int32(2**31 - 1)), reverse=True)
    k_row = idx - first
    cnt_row = last - first + 1
    is_dump_row = (sorted_gid % b) == 0
    cntp = jnp.where(is_dump_row, 0, cnt_row)
    srt2 = jax.lax.sort(
        (k_row, jnp.int32(2**31 - 1) - cntp, sorted_gid) + srt1[1:],
        num_keys=3,
    )
    return srt2[3]


@jax.jit
def phase_sort1_only(points, ids, negs):
    f = g1.f
    n_win = ids.shape[0]
    b = (1 << (c - 1)) + 1
    h = N_LIMBS // 2
    pts_pk = g1.pack_affine(points[:, :2])
    yw = pts_pk[:, h:]
    y = jnp.concatenate([yw & 0xFFFF, yw >> LIMB_BITS], axis=-1)
    ny = f.sub(jnp.zeros_like(y), y)
    nyw = ny[:, :h] | (ny[:, h:] << LIMB_BITS)
    pts_pk_neg = jnp.concatenate([pts_pk[:, :h], nyw], axis=-1)
    pt_inf = f.is_zero(points[:, 2])
    win_off = jnp.arange(n_win, dtype=jnp.int32)[:, None] * b
    gids = ids + win_off
    gids = jnp.where(pt_inf[None, :], win_off, gids).reshape(-1)
    rows0 = jnp.where(
        negs.reshape(-1)[:, None],
        jnp.tile(pts_pk_neg, (n_win, 1)),
        jnp.tile(pts_pk, (n_win, 1)),
    )
    srt1 = jax.lax.sort((gids,) + tuple(rows0[:, j] for j in range(N_LIMBS)), num_keys=1)
    return srt1[0]


@jax.jit
def phase_buckets(points, ids, negs):
    xyzz = os.environ.get("XYZZ", "0") == "1"
    return M._bucket_accumulate_sorted(g1, points, ids, negs, c, xyzz=xyzz)[0]


@jax.jit
def phase_reduce(buckets):
    return M.window_sums_of(buckets)


@jax.jit
def phase_combine(wsums):
    return M._window_combine(g1, wsums, c)


def bench(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # vary the first operand per iteration: the axon tunnel reports
    # near-zero time for repeated dispatches with identical inputs
    # (execution appears elided/replayed), which poisons same-args loops
    variants = [(args[0].at[(0,) * args[0].ndim].set(i),) + args[1:] for i in range(iters)]
    t0 = time.time()
    outs = [fn(*v) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{name:12s} {dt*1e3:9.1f} ms", file=sys.stderr)
    return out, dt


(ids, negs), t1 = bench("digits", phase_digits, scalars)
_, t_s1 = bench("sort1-only", phase_sort1_only, points, ids, negs)
_, t_pro = bench("prologue", phase_prologue, points, ids, negs)
buckets, t2 = bench("buckets", phase_buckets, points, ids, negs)
wsums, t3 = bench("reduce", phase_reduce, buckets)
acc, t4 = bench("combine", phase_combine, wsums)
print(f"{'slab-loop':12s} {(t2-t_pro)*1e3:9.1f} ms (buckets - prologue)", file=sys.stderr)
tot = t1 + t2 + t3 + t4
print(f"{'TOTAL':12s} {tot*1e3:9.1f} ms -> {n/tot:,.0f} points/s", file=sys.stderr)
