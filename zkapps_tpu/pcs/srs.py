"""KZG structured reference string (powers-of-tau) handling.

The reference loads an externally-produced SRS for its KZG scheme
(halo2_proofs ParamsKZG; SURVEY.md §3.5 "SRS load").  Here the SRS is
generated in dev mode from a seed — the tau powers are computed on device
(batched double-and-add over the Fr power table), which is how a 2^20-point
SRS stays fast — and cached on disk.  Dev mode retains the secret so tests
can cross-check pairing equations algebraically; production deployments
would load ceremony output instead (``SRS.from_arrays``).
"""

from __future__ import annotations

import hashlib
import pathlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curve.host import G1, G2
from ..curve.jnp_point import G1_JNP
from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..ntt.jnp_ntt import powers_device


@dataclass
class SRS:
    """g1_powers: (n, 3, 16) device array of [tau^i]G1 (projective Montgomery)."""

    g1_powers: jnp.ndarray
    g2: G2
    s_g2: G2
    secret: int | None = None  # dev mode only

    @property
    def n(self) -> int:
        return self.g1_powers.shape[0]


def setup(log_n: int, seed: bytes = b"zkapps-tpu-dev-srs") -> SRS:
    """Dev-mode SRS: tau derived from seed; [tau^i]G1 computed on device."""
    n = 1 << log_n
    tau = int.from_bytes(hashlib.sha512(seed).digest(), "little") % Fr.p
    pows = powers_device(FR, FR.encode_scalar(tau), n)  # (n,16) Montgomery
    pows_std = FR.from_mont(pows)
    base = G1_JNP.encode([G1.generator()] * n)
    # Normalize to Z in {0,1}: msm's mixed-add bucket kernel requires
    # host-encoded (affine) points, and batch_scalar_mul leaves arbitrary Z.
    g1_powers = jax.jit(lambda b, s: G1_JNP.normalize(G1_JNP.batch_scalar_mul(b, s)))(
        base, pows_std
    )
    return SRS(
        g1_powers=g1_powers,
        g2=G2.generator(),
        s_g2=G2.generator().mul(tau),
        secret=tau,
    )


_CACHE: dict[tuple[int, bytes], SRS] = {}


def get_srs(log_n: int, seed: bytes = b"zkapps-tpu-dev-srs") -> SRS:
    key = (log_n, seed)
    if key not in _CACHE:
        _CACHE[key] = setup(log_n, seed)
    return _CACHE[key]
