"""ctypes bindings for the native witness-generation runtime (native/*.cpp).

Compiled on demand with g++ (cached next to the source); everything degrades
gracefully to the pure-Python implementations when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

from ..fields.host import Fr
from ..hash.poseidon import poseidon_constants

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "witness.cpp"
_SO = _NATIVE_DIR / "libzkwitness.so"


def _build() -> pathlib.Path | None:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


@functools.cache
def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.zk_poseidon_init.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.zk_poseidon_hash_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_size_t,
        ctypes.c_void_p,
    ]
    lib.zk_merkle_build.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_size_t,
        ctypes.c_void_p,
    ]
    lib.zk_fr_mulmod.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p]
    # inject Poseidon parameters (Grain-generated on the Python side)
    rc, mds = poseidon_constants()
    rc_bytes = b"".join(Fr.to_bytes(c) for row in rc for c in row)
    mds_bytes = b"".join(Fr.to_bytes(c) for row in mds for c in row)
    lib.zk_poseidon_init(rc_bytes, mds_bytes)
    return lib


def available() -> bool:
    return load() is not None


def fr_mulmod(a: int, b: int) -> int:
    lib = load()
    assert lib is not None
    out = ctypes.create_string_buffer(32)
    lib.zk_fr_mulmod(Fr.to_bytes(a), Fr.to_bytes(b), out)
    return Fr.from_bytes(out.raw)


def poseidon_hash_batch(rows: list[list[int]]) -> list[int]:
    """Fixed-length Poseidon hash of equal-length rows (native)."""
    lib = load()
    assert lib is not None
    batch = len(rows)
    if batch == 0:
        return []
    length = len(rows[0])
    assert all(len(r) == length for r in rows)
    data = b"".join(Fr.to_bytes(v) for row in rows for v in row)
    out = ctypes.create_string_buffer(32 * batch)
    lib.zk_poseidon_hash_batch(data, batch, length, out)
    return [Fr.from_bytes(out.raw[i * 32 : (i + 1) * 32]) for i in range(batch)]


def merkle_build(leaves: list[int], depth: int) -> list[int]:
    """Full Poseidon Merkle tree, contract heap layout (node 1 = root).

    Returns the 2*size node values (index 0 unused = 0)."""
    lib = load()
    assert lib is not None
    size = 1 << depth
    assert len(leaves) <= size
    data = b"".join(Fr.to_bytes(v) for v in leaves)
    out = ctypes.create_string_buffer(32 * 2 * size)
    lib.zk_merkle_build(data, len(leaves), size, out)
    return [Fr.from_bytes(out.raw[i * 32 : (i + 1) * 32]) for i in range(2 * size)]
