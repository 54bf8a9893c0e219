"""Multi-device MSM: data-parallel over the point axis.

Each device runs the full Pippenger pipeline on its point shard (the
accumulation work — the O(n) term — divides by D), producing one projective
partial sum; partials are combined with a point-add all-reduce (all_gather of
D tiny (3,16) points + a local halving tree).  Communication volume is D
points — negligible — so scaling is limited only by the per-device
bucket-reduction term (O(2^c * windows), amortized away at large n/D).

A bucket-exchange variant (all-reduce the per-window bucket arrays with a
point-add combiner, then shard the window reductions) trades comm volume for
removing that fixed term; see NOTES.md — planned for the next round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..curve.jnp_point import G1_JNP
from ..parallel.mesh import AXIS
from .jnp_msm import default_window_bits, msm_core


def msm_sharded(mesh, points, scalars_std, c: int | None = None):
    """MSM over a device mesh.  points (n,3,16) / scalars (n,16) sharded on
    axis 0; returns a replicated (3,16) projective result."""
    n = points.shape[0]
    if c is None:
        c = default_window_bits(n // mesh.size)

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
        acc = gathered
        while acc.shape[0] > 1:
            half = acc.shape[0] // 2
            rest = acc[2 * half :]
            acc = G1_JNP.add(acc[:half], acc[half : 2 * half])
            if rest.shape[0]:
                acc = jnp.concatenate([acc, rest], axis=0)
        return acc[0]

    return jax.jit(run)(points, scalars_std)
