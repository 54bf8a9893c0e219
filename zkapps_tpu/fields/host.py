"""Host-side (Python bignum) prime-field arithmetic for BN254.

This is the exact-arithmetic ground truth that every device kernel is tested
against, and the implementation used on the non-hot host paths (transcript
challenge derivation, SRS generation, the pairing-based verifier).

Field parameters match the pinned halo2curves bn256 moduli
(reference: shielder/Cargo.lock:454-456,475-478):

- ``FQ_MODULUS``  base field of the BN254 curve (coordinates of G1/G2)
- ``FR_MODULUS``  scalar field (circuit values, polynomial coefficients)

Serialization convention follows halo2curves: canonical little-endian 32
bytes of the residue in [0, p).
"""

from __future__ import annotations

# BN254 (a.k.a. bn256 / alt_bn128) moduli.
FQ_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583
FR_MODULUS = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# Multiplicative generator and 2-adicity of Fr (needed for NTT roots of unity).
FR_GENERATOR = 7
FR_TWO_ADICITY = 28

FQ_GENERATOR = 3


class PrimeField:
    """A prime field GF(p) with exact Python-int arithmetic.

    Instances are lightweight namespaces of field ops; elements are plain ints
    in [0, p).
    """

    def __init__(self, p: int, generator: int | None = None, two_adicity: int | None = None):
        self.p = p
        self.generator = generator
        self.two_adicity = two_adicity
        self.num_bits = p.bit_length()
        self.num_bytes = 32

    # -- basic ops ---------------------------------------------------------
    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def inv(self, a: int) -> int:
        if a % self.p == 0:
            raise ZeroDivisionError("inverse of zero in prime field")
        return pow(a, self.p - 2, self.p)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def sqrt(self, a: int) -> int | None:
        """Tonelli-Shanks square root; returns None if ``a`` is a non-residue."""
        p = self.p
        a %= p
        if a == 0:
            return 0
        if pow(a, (p - 1) // 2, p) != 1:
            return None
        # Write p-1 = q * 2^s.
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        if s == 1:
            return pow(a, (p + 1) // 4, p)
        # Find a non-residue z.
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
        while t != 1:
            i, t2 = 0, t
            while t2 != 1:
                t2 = t2 * t2 % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            t, r = t * c % p, r * b % p
        return r

    # -- roots of unity ----------------------------------------------------
    def root_of_unity(self, log_n: int) -> int:
        """Primitive 2^log_n-th root of unity (requires 2^log_n | p-1)."""
        assert self.two_adicity is not None and log_n <= self.two_adicity
        base = pow(self.generator, (self.p - 1) >> self.two_adicity, self.p)
        return pow(base, 1 << (self.two_adicity - log_n), self.p)

    # -- serialization (halo2curves convention: canonical LE bytes) --------
    def to_bytes(self, a: int) -> bytes:
        return (a % self.p).to_bytes(32, "little")

    def from_bytes(self, data: bytes) -> int:
        v = int.from_bytes(data, "little")
        if v >= self.p:
            raise ValueError("non-canonical field element encoding")
        return v

    def from_uniform_bytes(self, data: bytes) -> int:
        """Reduce a (typically 64-byte) little-endian integer mod p.

        Matches halo2curves ``from_uniform_bytes`` used for hash-to-field and
        transcript challenge squeezing.
        """
        return int.from_bytes(data, "little") % self.p


Fq = PrimeField(FQ_MODULUS, generator=FQ_GENERATOR)
Fr = PrimeField(FR_MODULUS, generator=FR_GENERATOR, two_adicity=FR_TWO_ADICITY)
