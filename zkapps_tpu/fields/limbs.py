"""Limb encoding helpers: Python ints <-> (…, N_LIMBS) uint32 arrays.

TPU design note: JAX/XLA on TPU has no 64-bit integer multiplier, so a 254-bit
field element is represented as 16 little-endian limbs of 16 bits each, held in
uint32 lanes.  16x16-bit products fit a uint32 exactly, and the lazy-column
Montgomery multiplier in :mod:`zkapps_tpu.fields.jnp_ops` never overflows
32-bit accumulators (see bounds in that module).

This module is pure numpy (host side).
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
N_LIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Encode a non-negative int < 2^(16*n_limbs) as LE 16-bit limbs."""
    assert 0 <= x < (1 << (LIMB_BITS * n_limbs))
    out = np.empty((n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    return out


def limbs_to_int(limbs: np.ndarray) -> int:
    """Decode LE 16-bit limbs (1-D) into a Python int."""
    x = 0
    for i in range(limbs.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(limbs[i])
    return x


def ints_to_limbs(xs, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Vectorized encode: iterable of ints -> (len, n_limbs) uint32."""
    xs = list(xs)
    out = np.empty((len(xs), n_limbs), dtype=np.uint32)
    for r, x in enumerate(xs):
        v = x
        for i in range(n_limbs):
            out[r, i] = v & LIMB_MASK
            v >>= LIMB_BITS
        assert v == 0, "value does not fit in limbs"
    return out


def limbs_to_ints(arr: np.ndarray) -> list[int]:
    """Decode (..., n_limbs) uint32 -> flat list of ints (C-order over batch)."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    out = []
    for r in range(flat.shape[0]):
        out.append(limbs_to_int(flat[r]))
    return out
