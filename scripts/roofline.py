"""Per-kernel roofline: achieved rate vs speed-of-light on this chip.

Runs the library's hot kernels on the local accelerator with distinct
inputs (standalone repeat-dispatch microbenches through the axon tunnel
report elided near-zero times — every measurement here is a full pipeline
with varied inputs and one block_until_ready), derives each kernel's
achieved primitive rate, and compares it against an analytic
speed-of-light for the device:

* compute ceiling: u32 vector-multiply issue rate of the VPU (8x128 lanes,
  ~1 mult/lane/3 cycles measured on v5e — the limb kernels are
  multiply-issue bound, NOT flop bound; see NOTES.md round-4 model)
* memory ceiling: HBM stream bandwidth (v5e ~819 GB/s)

Prints one JSON line per kernel:
  {"kernel": ..., "achieved": R, "unit": ..., "sol": S, "pct_sol": P,
   "bound": "compute|memory"}

Fills BASELINE.md's roofline analysis as a runnable artifact (SURVEY.md §5
A1).  Env: LOG_N (default 18 — modest so a full run stays ~minutes).
"""

import json
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

LOG_N = int(os.environ.get("LOG_N", "18"))
N = 1 << LOG_N

set_unroll(False)
DEV = jax.devices()[0]
ON_TPU = DEV.platform != "cpu"
if ON_TPU:
    set_backend("pallas")

# -- device model ----------------------------------------------------------
# v5e: 8x128-lane VPU, ~1.7 GHz, u32 multiply ~3 cycles/issue (measured via
# the slab-loop cost model, NOTES.md); HBM ~819 GB/s.  Fall back to modest
# CPU numbers so the script runs (with meaningless ceilings) off-TPU.
if ON_TPU:
    MULTS_PER_S = (8 * 128) * 1.7e9 / 3  # u32 vector multiplies per second
    HBM_BYTES_PER_S = 819e9
else:
    MULTS_PER_S = 2e9
    HBM_BYTES_PER_S = 3e10

# Cost model per primitive, in u32 vector multiplies (the binding resource):
# one 16x16-limb Montgomery mul = 16 iters x (a*bi + p*m + m-compute) = ~48
# multiplies (plus adds/shifts that dual-issue); a point primitive is its
# mul count x 48.
MULTS_PER_FIELD_MUL = 48


def measured(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def report(kernel, achieved, unit, sol, bound):
    print(
        json.dumps(
            {
                "kernel": kernel,
                "achieved": round(achieved, 1),
                "unit": unit,
                "sol": round(sol, 1),
                "pct_sol": round(100.0 * achieved / sol, 1) if sol else None,
                "bound": bound,
            }
        ),
        flush=True,
    )


def main():
    print(f"roofline: device={DEV}, n=2^{LOG_N}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(11)

    # ---- field multiply (pallas fused kernel) ---------------------------
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(N, N_LIMBS), dtype=np.int64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(N, N_LIMBS), dtype=np.int64).astype(np.uint32))
    dt = measured(jax.jit(FR.mul), a, b)
    # sol: N muls x 48 multiplies at the VPU issue rate vs 3x(N x 64 B) HBM
    sol_compute = MULTS_PER_S / MULTS_PER_FIELD_MUL
    sol_memory = HBM_BYTES_PER_S / (3 * 64)
    sol = min(sol_compute, sol_memory)
    report(
        "field_mul",
        N / dt,
        "muls/s",
        sol,
        "compute" if sol_compute < sol_memory else "memory",
    )

    # ---- batched complete point add (12M + 2s + ~25A) -------------------
    from zkapps_tpu.curve.jnp_point import G1_JNP, distinct_generator_multiples

    pts, _ = distinct_generator_multiples(min(N, 1 << 18), seed=3)
    m = pts.shape[0]
    half = m // 2
    dt = measured(jax.jit(G1_JNP.add), pts[:half], pts[half : 2 * half])
    sol = MULTS_PER_S / (14 * MULTS_PER_FIELD_MUL)  # 12 muls + 2 small-const
    report("point_add_complete", half / dt, "adds/s", sol, "compute")

    # ---- MSM end to end (the headline) ----------------------------------
    from zkapps_tpu.msm.jnp_msm import default_window_bits, msm_to_host, num_windows

    scal = rng.integers(0, 1 << 16, size=(m, 16), dtype=np.int64).astype(np.uint32)
    scal[:, 15] &= 0x2FFF
    scal_d = jnp.asarray(scal)
    c = default_window_bits(m)
    t0 = time.time()
    msm_to_host(pts, scal_d, c)
    dt = time.time() - t0
    t0 = time.time()
    msm_to_host(pts, scal_d, c)
    dt = time.time() - t0
    # sol: W*m bucket addends x ~6 muls each (batch-affine) at the VPU rate
    pair_cost = 6 * MULTS_PER_FIELD_MUL
    sol = MULTS_PER_S / (num_windows(c) * pair_cost)
    report("msm_points", m / dt, "points/s", sol, "compute")

    # ---- NTT (butterflies: m/2 log m muls) ------------------------------
    from zkapps_tpu.ntt.jnp_ntt import get_plan

    log_m = min(LOG_N, 20)
    plan = get_plan(log_m)
    coeffs = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << log_m, N_LIMBS), dtype=np.int64).astype(np.uint32)
    )
    dt = measured(plan.forward, coeffs)
    nbf = (1 << log_m) * log_m / 2
    sol = MULTS_PER_S / MULTS_PER_FIELD_MUL  # 1 mul per butterfly
    report("ntt_butterflies", nbf / dt, "butterflies/s", sol, "compute")

    # ---- batched Poseidon permutation -----------------------------------
    from zkapps_tpu.hash.poseidon import get_poseidon

    pos = get_poseidon(FR)
    k = min(N, 1 << 16)
    rows = jnp.asarray(
        rng.integers(0, 1 << 16, size=(k, 2, N_LIMBS), dtype=np.int64).astype(np.uint32)
    )
    hasher = jax.jit(pos.hash_fixed)
    dt = measured(hasher, rows)
    # 8 full rounds x (5 sbox x 3 muls + 25 mds) + 56 partial x (3 + 25)
    mults = 8 * (15 + 25) + 56 * (3 + 25)
    sol = MULTS_PER_S / (mults * MULTS_PER_FIELD_MUL)
    report("poseidon_hashes", k / dt, "hashes/s", sol, "compute")


if __name__ == "__main__":
    main()
