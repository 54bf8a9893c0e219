"""Headline benchmark: Pippenger MSM throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "msm_points_per_s_2^20", "value": N, "unit": "points/s", "vs_baseline": R}

vs_baseline is measured against BASELINE.json: the reference publishes no
numbers ("published": {}), so the ratio is against a 1.0e6 points/s
working-baseline for a multicore CPU Pippenger of the reference's class at
2^20 (arkworks/halo2curves-era throughput); see BASELINE.md.

What's timed: ``msm_to_host`` — the library's real commitment path (device
bucket accumulation with the incomplete-xyzz fast kernel + poison check +
host Horner window combine), end to end including the device->host sync.
Inputs are n DISTINCT pseudo-random points (m_i * G, device-generated) and
random scalars; the result is verified on the first run against the exact
closed-form oracle (sum_i s_i * m_i mod r) * G.

Environment knobs:
  ZKTPU_BENCH_LOG_N    (default 20)      MSM size
  ZKTPU_BENCH_WINDOW   (default 16)      Pippenger window bits
  ZKTPU_BENCH_BACKEND  (default pallas)  'pallas' (fused Mosaic point kernels)
                                         or 'jnp'
  ZKTPU_BENCH_SCHEME   (default xyzz)    bucket-add kernel: 'xyzz' | 'complete'
  ZKTPU_BENCH_UNROLL   (default 0)       graph mode for the non-Pallas glue
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    log_n = int(os.environ.get("ZKTPU_BENCH_LOG_N", "20"))
    window = int(os.environ.get("ZKTPU_BENCH_WINDOW", "16"))
    unroll = os.environ.get("ZKTPU_BENCH_UNROLL", "0") == "1"
    backend = os.environ.get("ZKTPU_BENCH_BACKEND", "pallas")
    scheme = os.environ.get("ZKTPU_BENCH_SCHEME", "xyzz")

    n = 1 << log_n

    import jax

    # Persistent compile cache: the unrolled Mosaic/XLA graphs for the MSM
    # take minutes to compile cold; a repo-local cache makes repeat bench
    # runs (and the driver's run) start in seconds.
    cache_dir = os.environ.get(
        "ZKTPU_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from zkapps_tpu.fields.host import Fr
    from zkapps_tpu.fields.jnp_ops import set_backend, set_unroll
    from zkapps_tpu.curve.host import G1
    from zkapps_tpu.curve.jnp_point import distinct_generator_multiples
    from zkapps_tpu.msm.jnp_msm import msm_to_host

    set_unroll(unroll)
    dev = jax.devices()[0]
    if backend == "pallas" and dev.platform not in ("cpu",):
        set_backend("pallas")
    log(
        f"bench: device={dev}, n=2^{log_n}, c={window}, backend={backend}, "
        f"scheme={scheme}, unroll={unroll}"
    )

    t0 = time.time()
    points, mults = distinct_generator_multiples(n, seed=7)
    jax.block_until_ready(points)
    log(f"bench: distinct-point setup {time.time()-t0:.1f}s")

    rng = np.random.default_rng(7)
    scal_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint16).astype(np.uint32)
    # ensure < r: clear top bits of the last limb
    scal_np[:, 15] &= 0x2FFF
    scalars = jnp.asarray(scal_np)

    t0 = time.time()
    out = msm_to_host(points, scalars, window, scheme=scheme)
    compile_and_first = time.time() - t0
    log(f"bench: first run (incl compile) {compile_and_first:.1f}s")

    # full-size exact oracle: sum_i s_i * (m_i G) == (sum s_i m_i mod r) G
    s_total = 0
    for srow, m in zip(scal_np.astype("<u2"), mults):
        s_total = (s_total + int.from_bytes(srow.tobytes(), "little") * m) % Fr.p
    expect = G1.generator().mul(s_total)
    assert out.to_bytes() == expect.to_bytes(), "MSM result != closed-form oracle"
    log("bench: oracle check passed")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = msm_to_host(points, scalars, window, scheme=scheme)
    dt = (time.time() - t0) / iters
    pps = n / dt
    log(f"bench: steady-state {dt*1e3:.1f} ms -> {pps:,.0f} points/s")

    baseline_pps = 1.0e6  # reference-class multicore CPU Pippenger at 2^20
    print(
        json.dumps(
            {
                "metric": f"msm_points_per_s_2^{log_n}",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / baseline_pps, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
