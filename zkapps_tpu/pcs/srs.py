"""KZG structured reference string (powers-of-tau) handling.

The reference loads an externally-produced SRS for its KZG scheme
(halo2_proofs ParamsKZG; SURVEY.md §3.5 "SRS load").  Two paths:

* **dev mode** (``setup`` / ``get_srs``): tau derived from a seed, the tau
  powers computed on device (batched double-and-add over the Fr power
  table) — how a 2^20-point SRS stays fast.  Dev mode retains the secret so
  tests can cross-check pairing equations algebraically.
* **production** (``SRS.from_arrays`` / ``SRS.load``): ceremony output —
  host affine G1 powers plus the two G2 elements — loaded with NO secret.
  ``SRS.save``/``SRS.load`` (de)serialize in the halo2curves compressed
  per-point form (32 B per G1 power, 64 B per G2 point) so ParamsKZG-style
  ceremony exports can be converted offline and reused across processes.
"""

from __future__ import annotations

import hashlib
import io
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

_MAGIC = b"ZKTPUSRS"
_VERSION = 1


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

    # -- production load -------------------------------------------------
    @staticmethod
    def from_arrays(g1_points: list[G1], g2: G2, s_g2: G2) -> "SRS":
        """Build an SRS from ceremony output (host affine points, no secret).

        ``g1_points[i]`` must be [tau^i]G1; ``g2``/``s_g2`` are [1]G2 and
        [tau]G2.  Performs the cheap structural checks a loader can do
        without the secret: points on curve, first power = the generator.
        """
        if not g1_points:
            raise ValueError("empty SRS")
        if g1_points[0] != G1.generator():
            raise ValueError("SRS g1_powers[0] must be the generator")
        for pt in (g1_points[1], g1_points[-1]) if len(g1_points) > 1 else ():
            if pt.is_identity or not pt.is_on_curve():
                raise ValueError("invalid SRS point")
        if not (g2.is_on_curve() and s_g2.is_on_curve()):
            raise ValueError("invalid SRS G2 point")
        return SRS(
            g1_powers=G1_JNP.encode(g1_points), g2=g2, s_g2=s_g2, secret=None
        )

    # -- (de)serialization ------------------------------------------------
    def save(self, path: str | pathlib.Path) -> None:
        """Write the SRS in compressed per-point form (secret NOT saved)."""
        pts = G1_JNP.decode(self.g1_powers)
        buf = io.BytesIO()
        buf.write(_MAGIC)
        buf.write(_VERSION.to_bytes(4, "little"))
        buf.write(len(pts).to_bytes(8, "little"))
        buf.write(self.g2.to_bytes())
        buf.write(self.s_g2.to_bytes())
        for pt in pts:
            buf.write(pt.to_bytes())
        pathlib.Path(path).write_bytes(buf.getvalue())

    @staticmethod
    def load(path: str | pathlib.Path) -> "SRS":
        data = pathlib.Path(path).read_bytes()
        if data[:8] != _MAGIC:
            raise ValueError("not an SRS file")
        ver = int.from_bytes(data[8:12], "little")
        if ver != _VERSION:
            raise ValueError(f"unsupported SRS version {ver}")
        n = int.from_bytes(data[12:20], "little")
        off = 20
        g2 = G2.from_bytes(data[off : off + 64])
        s_g2 = G2.from_bytes(data[off + 64 : off + 128])
        off += 128
        if len(data) != off + 32 * n:
            raise ValueError("truncated SRS file")
        pts = [G1.from_bytes(data[off + 32 * i : off + 32 * (i + 1)]) for i in range(n)]
        return SRS.from_arrays(pts, g2, s_g2)


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
