"""Grain-LFSR Poseidon parameter generation.

Reimplements the constant-generation procedure from the Poseidon reference
implementation (generate_parameters_grain.sage), which the reference's pinned
proving stack uses for its in-circuit and native Poseidon
(halo2-base ``OptimizedPoseidonSpec::new::<R_F, R_P, 0>()`` — cited at
shielder/relations/src/relations/update_note.rs:114-117 — and the
``pse-poseidon`` dev-dependency, shielder/Cargo.lock:1029-1034).

Procedure:
1. 80-bit LFSR seeded from (field tag, sbox tag, n, t, R_F, R_P, 30 ones);
   taps at positions 62, 51, 38, 23, 13, 0; first 160 raw bits discarded.
2. Output bits via self-shrinking: read raw bits in pairs, emit the second
   bit of a pair iff the first is 1.
3. Round constants: (R_F+R_P) rows of t field elements, each sampled as
   n MSB-first bits with rejection (resample if >= p).
4. MDS: sample 2t elements *without* rejection (reduce mod p); first t are
   xs, next t are ys; Cauchy matrix mds[i][j] = 1/(xs[i]+ys[j]).  The secure
   index 0 selects the first candidate with distinct elements (matching the
   ``0`` const generic in OptimizedPoseidonSpec::new::<R_F,R_P,0>).
"""

from __future__ import annotations

import functools


class GrainLFSR:
    """80-bit Grain LFSR with self-shrinking output, as in the Poseidon paper."""

    def __init__(self, field_tag: int, sbox_tag: int, n: int, t: int, r_f: int, r_p: int):
        bits = []
        for value, width in ((field_tag, 2), (sbox_tag, 4), (n, 12), (t, 12), (r_f, 10), (r_p, 10)):
            bits.extend((value >> (width - 1 - i)) & 1 for i in range(width))
        bits.extend([1] * 30)
        assert len(bits) == 80
        self.state = bits
        # Discard the first 160 raw bits.
        for _ in range(160):
            self._raw_bit()

    def _raw_bit(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0)
        s.append(new)
        return new

    def next_bit(self) -> int:
        """Self-shrinking: pairs (b1, b2); emit b2 iff b1 == 1."""
        while True:
            b1 = self._raw_bit()
            b2 = self._raw_bit()
            if b1:
                return b2

    def next_bits(self, n: int) -> int:
        """n bits interpreted MSB-first as an integer."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.next_bit()
        return v

    def next_field_element(self, p: int, n_bits: int) -> int:
        """Rejection-sample a uniform element of [0, p)."""
        while True:
            v = self.next_bits(n_bits)
            if v < p:
                return v

    def next_field_element_without_rejection(self, p: int, n_bits: int) -> int:
        return self.next_bits(n_bits) % p


@functools.cache
def generate_poseidon_constants(
    p: int, t: int, r_f: int, r_p: int, n_bits: int = 254, secure_mds: int = 0
) -> tuple[tuple[tuple[int, ...], ...], tuple[tuple[int, ...], ...]]:
    """Returns (round_constants[(r_f+r_p)][t], mds[t][t]) as int tuples.

    field_tag=1 (prime field), sbox_tag=0 (x^alpha).
    """
    grain = GrainLFSR(field_tag=1, sbox_tag=0, n=n_bits, t=t, r_f=r_f, r_p=r_p)
    rounds = r_f + r_p
    rc = tuple(
        tuple(grain.next_field_element(p, n_bits) for _ in range(t)) for _ in range(rounds)
    )

    select = secure_mds
    while True:
        vals = [grain.next_field_element_without_rejection(p, n_bits) for _ in range(2 * t)]
        if len(set(vals)) != len(vals):
            continue  # retry until distinct
        if select != 0:
            select -= 1
            continue
        xs, ys = vals[:t], vals[t:]
        break

    mds = []
    for i in range(t):
        row = []
        for j in range(t):
            s = (xs[i] + ys[j]) % p
            assert s != 0, "Cauchy matrix requires x_i + y_j != 0"
            row.append(pow(s, p - 2, p))
        mds.append(tuple(row))
    return rc, tuple(mds)
