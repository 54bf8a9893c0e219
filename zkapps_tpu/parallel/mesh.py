"""Device-mesh helpers for the sharded kernels.

The reference's only parallelism is rayon shared-memory threading inside the
prover (SURVEY.md §2.3); the TPU-native equivalents shard the point /
coefficient axis over a jax.sharding.Mesh and exchange via XLA collectives
on ICI.  One 1-D axis ("shards") covers MSM (data parallel over points,
all-reduce of partial sums) and NTT (all_to_all transposes between local
butterfly passes).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shards"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), f"requested {n_devices} of {len(devices)} devices"
    return Mesh(np.array(devices[:n_devices]), (AXIS,))


def shard_leading(mesh: Mesh, arr):
    """Place an array sharded along its leading axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(AXIS)))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
