"""Multi-device MSM over a jax.sharding.Mesh.

Two strategies (the reference parallelizes Pippenger with rayon shared-memory
chunking only — SURVEY.md §2.3; these are its ICI-collective analogs):

1. ``msm_sharded`` — data-parallel points: each device runs the full
   Pippenger pipeline on its shard, partial sums are combined with a
   point-add all-reduce (all_gather of D tiny points + halving tree).
   Communication is negligible but every device pays the full
   O(2^c * windows) bucket-reduction term, which caps scaling at small n/D.

2. ``msm_bucket_exchange`` — data-parallel accumulation + *sharded
   reduction*: devices accumulate local buckets for all windows, then a
   recursive-halving reduce-scatter over the window axis (log2 D ppermute
   rounds with a point-add combiner, ~W*B points of total traffic) leaves
   each device with W/D fully-reduced windows; the suffix-scan reduction
   runs on 1/D of the buckets, and only the final W window sums are
   all_gathered for the Horner combine.  This removes the fixed term and is
   the strategy for the 2^24 multi-host target (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..curve.jnp_point import G1_JNP
from ..parallel.mesh import AXIS
from .jnp_msm import (
    _window_combine,
    default_window_bits,
    msm_buckets,
    msm_core,
    num_windows,
    window_sums_of,
)


def _allreduce_tree(gathered: jnp.ndarray) -> jnp.ndarray:
    """Point-add halving tree over axis 0."""
    acc = gathered
    while acc.shape[0] > 1:
        half = acc.shape[0] // 2
        rest = acc[2 * half :]
        acc = G1_JNP.add(acc[:half], acc[half : 2 * half])
        if rest.shape[0]:
            acc = jnp.concatenate([acc, rest], axis=0)
    return acc


# jitted-graph caches: repeat calls with the same (mesh, c) must NOT wrap a
# fresh jax.jit — a cold bucket-exchange compile is ~2 min on this sandbox's
# XLA:CPU, and the sharded prover commits ~8 polys per proof
_SHARDED_CACHE: dict = {}
_EXCHANGE_CACHE: dict = {}


def msm_sharded(mesh, points, scalars_std, c: int | None = None):
    """MSM over a device mesh.  points (n,3,16) / scalars (n,16) sharded on
    axis 0; returns a replicated (3,16) projective result."""
    n = points.shape[0]
    if c is None:
        c = default_window_bits(n // mesh.size)

    key = (id(mesh), c)
    if key not in _SHARDED_CACHE:

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS)),
            out_specs=P(),
            check_vma=False,
        )
        def run(pts, scs):
            partial = msm_core(pts, scs, c)  # (3,16) on each device
            gathered = jax.lax.all_gather(partial, AXIS)  # (D,3,16)
            return _allreduce_tree(gathered)[0]

        _SHARDED_CACHE[key] = jax.jit(run)
    return _SHARDED_CACHE[key](points, scalars_std)


def _reduce_scatter_windows(buckets: jnp.ndarray, d: int) -> jnp.ndarray:
    """Recursive-halving reduce-scatter along the window axis.

    buckets (W, B-1, 3, 16) local partials (same layout on every device,
    W divisible by d) -> (W/d, ...) fully-reduced windows; device r ends up
    owning windows [r*W/d, (r+1)*W/d) (MSB-first rank-bit halving keeps the
    natural order).
    """
    g1 = G1_JNP
    x = buckets
    h = d // 2
    rank = jax.lax.axis_index(AXIS)
    while h >= 1:
        half = x.shape[0] // 2
        low, high = x[:half], x[half:]
        keep_low = (rank & h) == 0
        send = jnp.where(keep_low, high, low)
        perm = [(i, i ^ h) for i in range(d)]
        recv = jax.lax.ppermute(send, AXIS, perm)
        keep = jnp.where(keep_low, low, high)
        x = g1.add(keep, recv)
        h //= 2
    return x


def msm_bucket_exchange(mesh, points, scalars_std, c: int | None = None):
    """Bucket-exchange MSM (module docstring strategy 2).

    points (n,3,16) / scalars (n,16) sharded on axis 0; replicated (3,16)
    projective result.  Window count is padded to a multiple of the mesh
    size with identity buckets.
    """
    n = points.shape[0]
    d = mesh.size
    if c is None:
        c = default_window_bits(n // d)
    w = num_windows(c)
    w_pad = -(-w // d) * d

    key = (id(mesh), c)
    if key not in _EXCHANGE_CACHE:

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS)),
            out_specs=P(),
            check_vma=False,
        )
        def run(pts, scs):
            buckets = msm_buckets(pts, scs, c)  # (W, B-1, 3, 16) local
            if w_pad != w:
                pad = G1_JNP.identity_like((w_pad - w, buckets.shape[1]))
                buckets = jnp.concatenate([buckets, pad], axis=0)
            mine = _reduce_scatter_windows(buckets, d)  # (W_pad/d, B-1, 3, 16)
            my_sums = window_sums_of(mine)  # (W_pad/d, 3, 16)
            all_sums = jax.lax.all_gather(my_sums, AXIS)  # (d, W_pad/d, 3, 16)
            window_sums = all_sums.reshape(w_pad, 3, all_sums.shape[-1])[:w]
            return _window_combine(G1_JNP, window_sums, c)

        _EXCHANGE_CACHE[key] = jax.jit(run)
    return _EXCHANGE_CACHE[key](points, scalars_std)
