"""Blake2b Fiat-Shamir transcript, following halo2_proofs' Blake2bWrite/Read.

The reference's proving backend derives all challenges from a blake2b state
(halo2_proofs blake2b_simd dependency, shielder/Cargo.lock:440; SURVEY.md
§3.5).  Conventions implemented to match the pinned halo2_proofs 0.3.0
transcript:

* state: blake2b, digest_size=64, personalization b"Halo2-Transcript"
* domain prefixes: 0 = challenge, 1 = point, 2 = scalar
* common_point absorbs the *affine coordinates* (x || y, canonical LE 32-byte
  reprs); points at infinity are rejected
* write_* additionally appends the compressed encoding to the proof stream
* squeeze_challenge: absorb the challenge prefix, clone-finalize the state to
  64 bytes, map to Fr via from_uniform_bytes (the state keeps accumulating)
"""

from __future__ import annotations

import hashlib

from ..curve.host import G1
from ..fields.host import Fr

BLAKE2B_PREFIX_CHALLENGE = b"\x00"
BLAKE2B_PREFIX_POINT = b"\x01"
BLAKE2B_PREFIX_SCALAR = b"\x02"
PERSONALIZATION = b"Halo2-Transcript"


def _new_state():
    return hashlib.blake2b(digest_size=64, person=PERSONALIZATION)


class Blake2bWrite:
    """Prover-side transcript: absorbs commitments, emits the proof stream."""

    def __init__(self):
        self.state = _new_state()
        self.proof = bytearray()

    # -- absorption ------------------------------------------------------
    def common_point(self, point: G1) -> None:
        # Matches halo2_proofs: the identity has no affine coordinates and is
        # REJECTED (with Z_H blinding on every witness-carrying commitment a
        # legitimate prover hits this only with negligible probability).
        if point.is_identity:
            raise ValueError("cannot absorb the identity point")
        self.state.update(BLAKE2B_PREFIX_POINT)
        self.state.update(point.x.to_bytes(32, "little"))
        self.state.update(point.y.to_bytes(32, "little"))

    def common_scalar(self, scalar: int) -> None:
        self.state.update(BLAKE2B_PREFIX_SCALAR)
        self.state.update((scalar % Fr.p).to_bytes(32, "little"))

    # -- proof stream ----------------------------------------------------
    def write_point(self, point: G1) -> None:
        self.common_point(point)
        self.proof += point.to_bytes()

    def write_scalar(self, scalar: int) -> None:
        self.common_scalar(scalar)
        self.proof += (scalar % Fr.p).to_bytes(32, "little")

    # -- challenges ------------------------------------------------------
    def squeeze_challenge(self) -> int:
        self.state.update(BLAKE2B_PREFIX_CHALLENGE)
        digest = self.state.copy().digest()
        return Fr.from_uniform_bytes(digest)

    def finalize(self) -> bytes:
        return bytes(self.proof)


class Blake2bRead:
    """Verifier-side transcript: replays the proof stream."""

    def __init__(self, proof: bytes):
        self.state = _new_state()
        self.proof = proof
        self.offset = 0

    def _take(self, n: int) -> bytes:
        if self.offset + n > len(self.proof):
            raise ValueError("proof stream exhausted")
        out = self.proof[self.offset : self.offset + n]
        self.offset += n
        return out

    def read_point(self) -> G1:
        point = G1.from_bytes(self._take(32))
        self.common_point(point)
        return point

    def read_scalar(self) -> int:
        scalar = Fr.from_bytes(self._take(32))
        self.state.update(BLAKE2B_PREFIX_SCALAR)
        self.state.update(scalar.to_bytes(32, "little"))
        return scalar

    def common_scalar(self, scalar: int) -> None:
        self.state.update(BLAKE2B_PREFIX_SCALAR)
        self.state.update((scalar % Fr.p).to_bytes(32, "little"))

    def common_point(self, point: G1) -> None:
        # Matches halo2_proofs: identity points are rejected (see Blake2bWrite).
        if point.is_identity:
            raise ValueError("cannot absorb the identity point")
        self.state.update(BLAKE2B_PREFIX_POINT)
        self.state.update(point.x.to_bytes(32, "little"))
        self.state.update(point.y.to_bytes(32, "little"))

    def squeeze_challenge(self) -> int:
        self.state.update(BLAKE2B_PREFIX_CHALLENGE)
        digest = self.state.copy().digest()
        return Fr.from_uniform_bytes(digest)

    def assert_consumed(self) -> None:
        if self.offset != len(self.proof):
            raise ValueError("trailing bytes in proof")
