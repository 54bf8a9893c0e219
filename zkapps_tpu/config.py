"""Typed configuration (SURVEY.md §5 "Config / flag system", component A6).

The reference configures itself with compile-time constants only: const
generics ``MerkleTree<DEPTH>`` (contract/merkle.rs:13-22), crate consts
``MERKLE_TREE_DEPTH=10`` / ``TOKENS_NUMBER=2`` (mocked_zk/src/lib.rs:16-17)
and the Poseidon parameters (relations/src/lib.rs:17-26).  The TPU build's
equivalent is ONE frozen dataclass that:

* mirrors the protocol constants read-only (they are pinned by the proof
  system — changing them here would silently desynchronize circuits, so
  ``configure`` only VALIDATES them against the defining modules);
* owns the runtime/kernel knobs that were previously scattered module-global
  setters (``set_backend`` / ``set_unroll`` / ``set_bucket_scheme`` and the
  MSM kernel-scheme choice) and applies them in one call;
* loads overrides from ``ZKTPU_*`` environment variables for script/bench
  use (the moral analog of the reference's cargo feature flags).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class ZkTpuConfig:
    # -- protocol constants (read-only mirrors; see module of record) -------
    merkle_depth: int = 10  # mocked/__init__.py MERKLE_TREE_DEPTH
    tokens: int = 2  # mocked/__init__.py TOKENS_NUMBER
    poseidon_t: int = 5  # hash/poseidon.py T_WIDTH
    poseidon_rate: int = 4  # hash/poseidon.py RATE
    poseidon_rf: int = 8  # hash/poseidon.py R_F
    poseidon_rp: int = 56  # hash/poseidon.py R_P

    # -- runtime / kernel knobs (applied by ``configure``) -------------------
    backend: str = "jnp"  # 'jnp' | 'pallas' (fields/jnp_ops.set_backend)
    unroll: bool = False  # straight-line vs fori-loop field ops
    bucket_scheme: str = "sorted"  # MSM layout: 'sorted' | 'gather'
    msm_scheme: str = "xyzz"  # bucket kernel: 'complete' | 'xyzz' | 'affine'
    window_bits: int | None = None  # None = msm.default_window_bits(n)

    # -- mesh (distributed prove/kernels) ------------------------------------
    mesh_devices: int | None = None  # None = single device
    mesh_axis: str = "shard"

    def validate(self) -> None:
        from .hash import poseidon as _pos
        from .mocked import MERKLE_TREE_DEPTH, TOKENS_NUMBER

        pinned = {
            "merkle_depth": MERKLE_TREE_DEPTH,
            "tokens": TOKENS_NUMBER,
            "poseidon_t": _pos.T_WIDTH,
            "poseidon_rate": _pos.RATE,
            "poseidon_rf": _pos.R_F,
            "poseidon_rp": _pos.R_P,
        }
        for name, want in pinned.items():
            got = getattr(self, name)
            if got != want:
                raise ValueError(
                    f"{name}={got} is a protocol constant pinned to {want}; "
                    "it cannot be reconfigured (circuits/chain state would "
                    "silently desynchronize)"
                )
        if self.backend not in ("jnp", "pallas"):
            raise ValueError(f"backend must be 'jnp' or 'pallas', got {self.backend!r}")
        if self.bucket_scheme not in ("sorted", "gather"):
            raise ValueError(f"bucket_scheme: {self.bucket_scheme!r}")
        if self.msm_scheme not in ("complete", "xyzz", "affine"):
            raise ValueError(f"msm_scheme: {self.msm_scheme!r}")
        if self.window_bits is not None and not (1 <= self.window_bits <= 24):
            raise ValueError(f"window_bits out of range: {self.window_bits}")
        if self.mesh_devices is not None and self.mesh_devices < 1:
            raise ValueError(f"mesh_devices: {self.mesh_devices}")


_CURRENT = ZkTpuConfig()


def configure(cfg: ZkTpuConfig | None = None, **overrides) -> ZkTpuConfig:
    """Validate ``cfg`` (or the current config with ``overrides``) and apply
    its runtime knobs to the kernel modules.  Returns the applied config."""
    global _CURRENT
    if cfg is None:
        cfg = dataclasses.replace(_CURRENT, **overrides)
    elif overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    cfg.validate()

    from .fields.jnp_ops import set_backend, set_unroll
    from .msm.jnp_msm import set_bucket_scheme

    set_backend(cfg.backend)
    set_unroll(cfg.unroll)
    set_bucket_scheme(cfg.bucket_scheme)
    _CURRENT = cfg
    return cfg


def current() -> ZkTpuConfig:
    return _CURRENT


_ENV_FIELDS = {
    "ZKTPU_BACKEND": ("backend", str),
    "ZKTPU_UNROLL": ("unroll", lambda v: v == "1"),
    "ZKTPU_BUCKET_SCHEME": ("bucket_scheme", str),
    "ZKTPU_MSM_SCHEME": ("msm_scheme", str),
    "ZKTPU_WINDOW_BITS": ("window_bits", int),
    "ZKTPU_MESH_DEVICES": ("mesh_devices", int),
}


def from_env(base: ZkTpuConfig | None = None) -> ZkTpuConfig:
    """Config with ``ZKTPU_*`` environment overrides applied (not activated —
    pass the result to ``configure``)."""
    cfg = base or _CURRENT
    overrides = {}
    for env, (field, conv) in _ENV_FIELDS.items():
        raw = os.environ.get(env)
        if raw is not None:
            overrides[field] = conv(raw)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
