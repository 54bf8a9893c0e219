"""NTT throughput on the local accelerator (BASELINE.md config 2 metric).

Radix-2 forward NTT over BN254 Fr at 2^LOG_N: reports wall-clock and
butterflies/s (n/2 * log_n butterflies per transform).  Uses distinct
pseudo-random inputs per iteration (the axon tunnel elides repeated
identical dispatches) and a final block over all outputs.
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

from zkapps_tpu.fields.host import Fr
from zkapps_tpu.fields.jnp_ops import FR, set_backend, set_unroll
from zkapps_tpu.ntt.jnp_ntt import get_plan
from zkapps_tpu.ntt.host import ntt_host

log_n = int(os.environ.get("LOG_N", "20"))
iters = int(os.environ.get("ITERS", "4"))
n = 1 << log_n

set_unroll(False)
dev = jax.devices()[0]
if dev.platform != "cpu":
    set_backend("pallas")
print(f"device={dev} n=2^{log_n}", file=sys.stderr, flush=True)

plan = get_plan(log_n)
rng = np.random.default_rng(3)
variants = []
for i in range(iters + 1):
    c = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint16).astype(np.uint32)
    c[:, 15] &= 0x2FFF
    variants.append(jnp.asarray(c))

fwd = jax.jit(plan.forward)
t0 = time.time()
out = fwd(variants[0])
jax.block_until_ready(out)
print(f"warm (incl compile) {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

# small-size exactness probe against the host NTT (first 2^10 coefficients
# zero-padded transform would differ; instead check a dedicated small plan)
small = get_plan(10)
xs = [int(i * 7919 + 11) % Fr.p for i in range(1 << 10)]
got = FR.decode(jax.jit(small.forward)(FR.encode(xs)))
assert got == ntt_host(xs), "device NTT != host NTT at 2^10"
print("host-oracle check (2^10) passed", file=sys.stderr, flush=True)

t0 = time.time()
outs = [fwd(v) for v in variants[1:]]
jax.block_until_ready(outs)
dt = (time.time() - t0) / iters
bf = (n // 2) * log_n
print(
    f"steady {dt*1e3:.1f} ms -> {bf/dt/1e9:.2f} G butterflies/s "
    f"({n/dt/1e6:.1f} M coeffs/s)",
    file=sys.stderr,
    flush=True,
)
import json

print(
    json.dumps(
        {
            "metric": f"ntt_butterflies_per_s_2^{log_n}",
            "value": round(bf / dt, 1),
            "unit": "butterflies/s",
        }
    ),
    flush=True,
)
