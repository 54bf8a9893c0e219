"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY.md §4: multi-host
collective tests run on xla_force_host_platform_device_count CPU meshes so
N-device code paths are exercised without TPUs).
"""

import os

# Force CPU: the sandbox pins JAX_PLATFORMS=axon (a tunnelled TPU) which makes
# eager dispatch and compiles orders of magnitude slower for test-sized work.
# The axon sitecustomize overrides the env var, so jax.config (below) is the
# authoritative switch; the env var still helps early initialization paths.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Compact (fori_loop) limb-arithmetic graphs: XLA:CPU compiles the big
# unrolled graphs ~10x slower than it runs them; tests use the looped mode.
# test_fields has an explicit unrolled-vs-looped equivalence check.
from zkapps_tpu.fields.jnp_ops import set_unroll  # noqa: E402

set_unroll(False)
# NOTE: deliberately NO persistent compilation cache.  On this sandbox the
# axon sitecustomize makes XLA:CPU AOT artifacts carry a foreign machine
# profile; reloading them SIGSEGVs (observed).  The looped field-op mode keeps
# in-process compiles cheap instead.


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _fresh_jax_caches():
    """Clear jax's in-process compile caches at each module boundary.

    Full-suite runs segfault inside XLA:CPU's backend_compile_and_load
    (jax compiler.py) partway through tests/test_plonk.py, while the same
    file passes when run alone — the trigger is compiler state accumulated
    across the preceding ~1000 in-process compiles, not any single test.
    Starting each module from a clean cache reproduces the passing solo
    conditions; the cost is recompiling a handful of shared ops per module
    (the looped field-op graphs compile in ms on XLA:CPU).

    Workaround, not a root-cause fix: the crash is inside XLA:CPU's
    backend_compile_and_load under accumulated compiler state (seen on the
    jax 0.9.x pin of this sandbox image); remove this fixture once a jax/XLA
    upgrade no longer reproduces the full-suite segfault.
    """
    jax.clear_caches()
    yield
