"""Poseidon hash over BN254 Fr: exact host implementation + batched TPU kernels.

Parameters follow the reference relations crate
(shielder/relations/src/lib.rs:17-26): T=5, RATE=4, R_F=8 full rounds,
R_P=56 partial rounds, S-box x^5, constants from the Grain LFSR
(:mod:`zkapps_tpu.hash.grain`).

Sponge semantics mirror the pse-poseidon native hasher the reference pins as
its witness-generation oracle (shielder/Cargo.lock:1029-1034), which
halo2-base's in-circuit ``hash_fix_len_array`` is tested against upstream:

* initial state = [2^64, 0, ..., 0]  (capacity tag in state[0])
* absorb: buffer inputs; every full RATE chunk is field-added into
  state[1..=RATE] followed by a permutation
* squeeze: append the padding marker ``1`` to the remaining buffer, add into
  state[1..], permute once, output state[1]

The device implementation vectorizes the permutation over a batch axis: state
is a (B, T, 16) uint32 limb array in Montgomery form, the S-box is 3 batched
field muls, and the MDS layer is a constant-matrix linear combination (the
MXU-matmul fast path is a planned Pallas optimization; see NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import FR_MODULUS, Fr
from ..fields.jnp_ops import FR, LimbField
from ..fields.limbs import N_LIMBS, ints_to_limbs
from .grain import generate_poseidon_constants

T_WIDTH = 5
RATE = 4
R_F = 8
R_P = 56

CAPACITY_TAG = 1 << 64  # initial value of state[0] (pse-poseidon State::default)
PADDING = 1  # squeeze-time padding marker appended to the last chunk


@functools.cache
def poseidon_constants(
    p: int = FR_MODULUS, t: int = T_WIDTH, r_f: int = R_F, r_p: int = R_P
):
    return generate_poseidon_constants(p, t, r_f, r_p, n_bits=254)


# ---------------------------------------------------------------------------
# Host (exact) implementation
# ---------------------------------------------------------------------------


def permute_host(state: list[int], p: int = FR_MODULUS) -> list[int]:
    """One Poseidon permutation on a t-element state of Python ints."""
    rc, mds = poseidon_constants(p)
    t = len(state)
    r_f_half = R_F // 2
    s = [x % p for x in state]

    def mix(s):
        return [sum(mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]

    rnd = 0
    for _ in range(r_f_half):
        s = [(x + c) % p for x, c in zip(s, rc[rnd])]
        s = [pow(x, 5, p) for x in s]
        s = mix(s)
        rnd += 1
    for _ in range(R_P):
        s = [(x + c) % p for x, c in zip(s, rc[rnd])]
        s[0] = pow(s[0], 5, p)
        s = mix(s)
        rnd += 1
    for _ in range(r_f_half):
        s = [(x + c) % p for x, c in zip(s, rc[rnd])]
        s = [pow(x, 5, p) for x in s]
        s = mix(s)
        rnd += 1
    return s


class PoseidonHost:
    """pse-poseidon-style sponge over Python ints (witness-gen oracle)."""

    def __init__(self, p: int = FR_MODULUS):
        self.p = p
        self.state = [CAPACITY_TAG % p] + [0] * (T_WIDTH - 1)
        self.absorbing: list[int] = []

    def update(self, elements: list[int]) -> None:
        buf = self.absorbing + [e % self.p for e in elements]
        self.absorbing = []
        i = 0
        while len(buf) - i >= RATE:
            chunk = buf[i : i + RATE]
            for k in range(RATE):
                self.state[1 + k] = (self.state[1 + k] + chunk[k]) % self.p
            self.state = permute_host(self.state, self.p)
            i += RATE
        self.absorbing = buf[i:]

    def squeeze(self) -> int:
        last_chunk = self.absorbing + [PADDING]
        for k, e in enumerate(last_chunk):
            self.state[1 + k] = (self.state[1 + k] + e) % self.p
        self.state = permute_host(self.state, self.p)
        self.absorbing = []
        return self.state[1]


def hash_host(inputs: list[int], p: int = FR_MODULUS) -> int:
    """Fixed-length Poseidon hash (the reference's hash_fix_len_array)."""
    h = PoseidonHost(p)
    h.update(list(inputs))
    return h.squeeze()


# ---------------------------------------------------------------------------
# Device (batched jnp) implementation
# ---------------------------------------------------------------------------


class PoseidonDevice:
    """Vectorized Poseidon over (B, ...) batches of Fr limb vectors.

    ``mxu=True`` routes the MDS layer through one s8 nibble matmul per round
    (the TPU systolic array) instead of T*T batched limb multiplies — see
    ``_mix_mxu``.  Bit-identical output; ~T*T muls -> ~T/2 mul-equivalents
    of VPU work per round plus one small MXU matmul.
    """

    def __init__(self, field: LimbField = FR, mxu: bool = False):
        self.f = field
        self.mxu = mxu
        p = field.p
        rc, mds = poseidon_constants(p)
        to_mont = lambda v: v * field.r % p  # noqa: E731
        # (rounds, T, 16) round constants, Montgomery.
        self.rc = jnp.asarray(
            np.stack([ints_to_limbs([to_mont(c) for c in row]) for row in rc]),
            dtype=jnp.uint32,
        )
        # (T, T, 16) MDS, Montgomery.
        self.mds = jnp.asarray(
            np.stack([ints_to_limbs([to_mont(c) for c in row]) for row in mds]),
            dtype=jnp.uint32,
        )
        self.capacity = field.encode_scalar(CAPACITY_TAG)  # (16,)
        self.pad_one = field.encode_scalar(PADDING)
        if mxu:
            self._mds_nib = self._build_mds_nibble_matrix(mds, field)

    # -- MXU MDS path ---------------------------------------------------
    # The MDS layer out[i] = sum_j mds[i][j]*s[j] is a SHARED linear map —
    # the one place in this codebase where the systolic array pays for
    # bignum work (pairwise field muls don't map to it; NOTES.md).  The
    # 256-bit integers are decomposed into 64 base-16 nibbles; the double-
    # width integer product sum then becomes ONE (B, T*64) @ (T*64, T*127)
    # s8->s32 matmul (nibble products <= 225, <= 321 terms per output
    # column -> max 72,225, no overflow), whose output columns regroup into
    # 32 base-2^16 columns fed to LimbField.mont_reduce_columns.  X < 5p^2
    # < p*R keeps the REDC output in [0, 2p) -> one conditional subtract.
    @staticmethod
    def _build_mds_nibble_matrix(mds, field) -> jnp.ndarray:
        t = len(mds)
        nib_in = 4 * N_LIMBS  # 64 nibbles per 256-bit operand
        nib_out = 2 * nib_in - 1  # 127 product columns
        m = np.zeros((t * nib_in, t * nib_out), dtype=np.int8)
        for i in range(t):
            for j in range(t):
                c = mds[i][j] * field.r % field.p  # Montgomery form
                cn = [(c >> (4 * k)) & 15 for k in range(nib_in)]
                for mm in range(nib_in):
                    for l in range(nib_in):
                        m[j * nib_in + mm, i * nib_out + mm + l] = cn[l]
        return jnp.asarray(m)

    def _mix_mxu(self, s):
        """s: (..., T, 16) canonical-limb Montgomery residues -> same."""
        batch = s.shape[:-2]
        t = T_WIDTH
        nib_in = 4 * N_LIMBS
        nib_out = 2 * nib_in - 1
        # (…, T, 16) -> (…, T*64) s8 nibbles (little-endian within limbs)
        nib = jnp.stack([(s >> (4 * r)) & 15 for r in range(4)], axis=-1)
        v = nib.reshape(batch + (t * nib_in,)).astype(jnp.int8)
        out = jax.lax.dot_general(
            v,
            self._mds_nib,
            (((v.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (…, T*127)
        coln = out.reshape(batch + (t, nib_out))
        coln = jnp.pad(coln, [(0, 0)] * (coln.ndim - 1) + [(0, 1)])  # -> 128
        # 4 consecutive nibble columns -> one base-2^16 column
        w = (1 << (4 * jnp.arange(4, dtype=jnp.int32)))
        cols = (coln.reshape(batch + (t, 2 * N_LIMBS, 4)) * w).sum(-1)
        return self.f.mont_reduce_columns(cols.astype(jnp.uint32))

    # -- permutation ----------------------------------------------------
    def _sbox_full(self, s):
        f = self.f
        x2 = f.mul(s, s)
        x4 = f.mul(x2, x2)
        return f.mul(x4, s)

    def _mix(self, s):
        """MDS layer: out[i] = sum_j mds[i][j] * s[j].  s: (B, T, 16)."""
        if self.mxu:
            return self._mix_mxu(s)
        f = self.f
        # (B, 1, T, 16) * (T, T, 16) -> (B, T, T, 16) then tree-reduce over j.
        prod = f.mul(s[..., None, :, :], self.mds)
        acc = prod[..., 0, :]
        for j in range(1, T_WIDTH):
            acc = f.add(acc, prod[..., j, :])
        return acc

    def permute(self, state: jnp.ndarray) -> jnp.ndarray:
        """state: (..., T, 16) uint32 Montgomery -> same shape."""
        f = self.f
        r_f_half = R_F // 2

        def full_round(s, rc_row):
            s = f.add(s, rc_row)
            s = self._sbox_full(s)
            return self._mix(s), None

        def partial_round(s, rc_row):
            s = f.add(s, rc_row)
            s0 = self._sbox_full(s[..., 0:1, :])
            s = jnp.concatenate([s0, s[..., 1:, :]], axis=-2)
            return self._mix(s), None

        s = state
        s, _ = jax.lax.scan(full_round, s, self.rc[:r_f_half])
        s, _ = jax.lax.scan(partial_round, s, self.rc[r_f_half : r_f_half + R_P])
        s, _ = jax.lax.scan(full_round, s, self.rc[r_f_half + R_P :])
        return s

    # -- fixed-length hash ---------------------------------------------
    def hash_fixed(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (..., L, 16) Montgomery -> (..., 16) digest.

        L is static; replicates the sponge: full RATE chunks then the padded
        final chunk.  For L=2 (merkle node): 1 permutation.  L=4: 2.
        """
        f = self.f
        batch = inputs.shape[:-2]
        L = inputs.shape[-2]
        state = jnp.zeros(batch + (T_WIDTH, N_LIMBS), dtype=jnp.uint32)
        state = state.at[..., 0, :].set(jnp.broadcast_to(self.capacity, batch + (N_LIMBS,)))

        chunks = [list(range(i, min(i + RATE, L))) for i in range(0, L, RATE)]
        if not chunks:
            chunks = [[]]
        # All chunks except a final partial one are full.
        for ci, idxs in enumerate(chunks):
            is_last = ci == len(chunks) - 1
            if len(idxs) == RATE:
                upd = f.add(state[..., 1 : 1 + RATE, :], inputs[..., idxs[0] : idxs[0] + RATE, :])
                state = jnp.concatenate([state[..., 0:1, :], upd], axis=-2)
                state = self.permute(state)
                if is_last:
                    # padding chunk: just the marker 1
                    s1 = f.add(state[..., 1, :], self.pad_one)
                    state = state.at[..., 1, :].set(s1)
                    state = self.permute(state)
            else:
                k = len(idxs)
                if k:
                    upd = f.add(state[..., 1 : 1 + k, :], inputs[..., idxs[0] : idxs[0] + k, :])
                    state = jnp.concatenate(
                        [state[..., 0:1, :], upd, state[..., 1 + k :, :]], axis=-2
                    )
                sp = f.add(state[..., 1 + k, :], self.pad_one)
                state = state.at[..., 1 + k, :].set(sp)
                state = self.permute(state)
        return state[..., 1, :]

    def hash2(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """Batched 2-ary merkle-node hash: (..., 16) x2 -> (..., 16)."""
        return self.hash_fixed(jnp.stack([left, right], axis=-2))


@functools.cache
def get_poseidon(field: LimbField = FR, mxu: bool = False) -> PoseidonDevice:
    return PoseidonDevice(field, mxu=mxu)
