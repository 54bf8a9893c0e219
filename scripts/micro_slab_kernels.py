"""Head-to-head slab-kernel microbenchmark: complete RCB15 vs xyzz.

Isolates the MSM bucket-accumulation kernels (fields/pallas_ops) at
production width (2^19 lanes, SLAB_R rows) so a kernel change can be
costed in one number without recompiling the whole MSM.

CAVEAT (sandbox): through the axon TPU tunnel, standalone kernel timings
come back orders of magnitude too fast even with distinct inputs per call —
the dispatches appear elided.  Full-pipeline timings (bench.py,
profile_msm_sorted.py with varied inputs) are reliable; treat this script's
absolute numbers as valid only on directly-attached TPUs.
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
r = int(os.environ.get("R", "4"))
iters = int(os.environ.get("ITERS", "10"))

g = G1.generator()
base = G1_JNP.encode([g.mul(3 * i + 2) for i in range(64)])
pts = jnp.tile(base, (n // 64, 1, 1))
acc4 = jnp.concatenate([pts[:, :2], pts[:, 2:], pts[:, 2:]], axis=1)  # (n,4,16) xyzz
qpk = jnp.tile(G1_JNP.pack_affine(base[:, :2]), (n // 64, 1))
slabs = jnp.stack([jnp.roll(qpk, k, axis=0) for k in range(r)], axis=1)  # (n,r,16)
vmask = jnp.full((n, 1), (1 << r) - 1, jnp.uint32)
pflags = jnp.zeros((n, 1), jnp.uint32)

rows = []
for tile in (256, 512, 1024):
    for name in ("complete", "xyzz"):
        try:
            if name == "complete":
                fn = jax.jit(
                    lambda a, s, v: P.pmadd_slab_pallas(a, s, v, FQ.p, FQ.n0inv, tile)
                )
                args = (pts, slabs, vmask)
            else:
                fn = jax.jit(
                    lambda a, s, v, f: P.pxyzz_slab_pallas(
                        a, s, v, f, FQ.p, FQ.n0inv, tile
                    )
                )
                args = (acc4, slabs, vmask, pflags)
            out = fn(*args)
            jax.block_until_ready(out)
            # NOTE: do NOT chain output->input here — on the axon tunnel a
            # chained same-executable loop reports near-zero time (execution
            # appears deferred/elided); independent calls with distinct
            # inputs + a block over the output list measure real time.
            accs = [
                (acc4 if name == "xyzz" else pts).at[0, 0, 0].set(i)
                for i in range(iters)
            ]
            t0 = time.time()
            outs = [fn(a, *args[1:]) for a in accs]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / iters
            madds = n * r
            print(
                f"{name:9s} tile={tile:5d}  {dt*1e3:7.2f} ms  "
                f"{madds/dt/1e6:7.2f} Madd/s  ({dt/madds*1e9:.1f} ns/madd)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:9s} tile={tile:5d}  FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
