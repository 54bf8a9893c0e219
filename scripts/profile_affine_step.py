"""Per-phase timing of ONE batch-affine accumulation step vs ONE xyzz slab
call (SLAB_R steps) at MSM full-tier width — locates where the affine
scheme's time goes (prep chains / batched inverse / apply) on real hardware.

Env: LOG_N (default 20), WINDOW (default 16), TILE (default AFFINE_TILE).
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
from zkapps_tpu.fields.limbs import N_LIMBS
from zkapps_tpu.curve.host import G1
from zkapps_tpu.curve.jnp_point import G1_JNP
from zkapps_tpu.fields import pallas_ops as P
from zkapps_tpu.msm import jnp_msm as M

log_n = int(os.environ.get("LOG_N", "20"))
c = int(os.environ.get("WINDOW", "16"))
tile = int(os.environ.get("TILE", str(P.AFFINE_TILE)))
n = 1 << log_n

set_unroll(False)
dev = jax.devices()[0]
if dev.platform != "cpu":
    set_backend("pallas")
n_win = M.num_windows(c)
b = (1 << (c - 1)) + 1
width = n_win * b
w_pad = -(-width // tile) * tile
print(
    f"device={dev} n=2^{log_n} c={c} width={width} w_pad={w_pad} tile={tile} "
    f"G={P.AFFINE_G}",
    file=sys.stderr,
)

g1 = G1_JNP
rng = np.random.default_rng(3)

# synthetic but realistic state: random field-ish values, ~Poisson occupancy
ax = jnp.asarray(rng.integers(0, 1 << 16, size=(w_pad, N_LIMBS), dtype=np.int64).astype(np.uint32))
ay = jnp.asarray(rng.integers(0, 1 << 16, size=(w_pad, N_LIMBS), dtype=np.int64).astype(np.uint32))
occ = jnp.asarray((rng.random((w_pad, 1)) < 0.95).astype(np.uint32))
pfl = jnp.zeros((w_pad, 1), jnp.uint32)
rows = jnp.asarray(rng.integers(0, 1 << 31, size=(w_pad, N_LIMBS), dtype=np.int64).astype(np.uint32))
vm = jnp.asarray((rng.random((w_pad, 1)) < 0.9).astype(np.uint32))

f = FR


def bench(name, fn, *args, iters=3, vary=0):
    out = fn(*args)
    jax.block_until_ready(out)
    variants = [
        (args[vary].at[(0,) * args[vary].ndim].set(i),) + args[vary + 1 :]
        for i in range(iters)
    ]
    variants = [args[:vary] + v for v in variants]
    t0 = time.time()
    outs = [fn(*v) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{name:16s} {dt*1e3:9.2f} ms", file=sys.stderr)
    return dt


# -- phase 1: prep ----------------------------------------------------------
prep = lambda ax_, occ_, rows_, vm_: P.paffine_prep_pallas(  # noqa: E731
    ax_, occ_, rows_, vm_, f.p, f.n0inv, tile, False
)
t_prep = bench("prep", prep, ax, occ, rows, vm)
cp = prep(ax, occ, rows, vm)

# -- phase 2: batch inverse -------------------------------------------------
cw = tile // P.AFFINE_G
ntiles = w_pad // tile
m = ntiles * cw
m2 = max(256, 1 << (m - 1).bit_length())
prods = cp.reshape(ntiles, tile, N_LIMBS)[:, -cw:, :].reshape(m, N_LIMBS)
if m2 != m:
    pad = jnp.broadcast_to(f.one_mont, (m2 - m, N_LIMBS))
    prods = jnp.concatenate([prods, pad], axis=0)
inv = lambda pr: P.pbatchinv_pallas(pr, f.p, f.n0inv, False)  # noqa: E731
t_inv = bench("batchinv", inv, prods)
ic = inv(prods)[:m]

# -- phase 3: apply ---------------------------------------------------------
apply_ = lambda ax_, ay_, occ_, pfl_, rows_, vm_, cp_, ic_: P.paffine_apply_pallas(  # noqa: E731
    ax_, ay_, occ_, pfl_, rows_, vm_, cp_, ic_, f.p, f.n0inv, tile, False
)
t_apply = bench("apply", apply_, ax, ay, occ, pfl, rows, vm, cp, ic)

t_step = t_prep + t_inv + t_apply
print(f"{'affine step':16s} {t_step*1e3:9.2f} ms  (sum of phases)", file=sys.stderr)

# -- xyzz slab (SLAB_R steps in one call) at the same width -----------------
acc = g1.identity_xyzz_like((width,))
slabs = jnp.asarray(
    rng.integers(0, 1 << 31, size=(width, M.SLAB_R, N_LIMBS), dtype=np.int64).astype(np.uint32)
)
vmx = jnp.asarray(rng.integers(0, 1 << M.SLAB_R, size=(width,), dtype=np.int64).astype(np.uint32))
flags = jnp.zeros((width,), jnp.uint32)


def slab(acc_, slabs_, vmx_, flags_):
    return g1.madd_slab_xyzz(acc_, slabs_, vmx_, flags_)


t_slab = bench("xyzz slab(R=8)", slab, acc, slabs, vmx, flags, vary=1)
print(
    f"\nper-step: affine {t_step*1e3:.2f} ms vs xyzz {t_slab/M.SLAB_R*1e3:.2f} ms "
    f"(ratio {t_step/(t_slab/M.SLAB_R):.2f}x)",
    file=sys.stderr,
)
