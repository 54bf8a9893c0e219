"""BN254 curve arithmetic, host side (exact Python bignum).

The correctness oracle for the batched device point kernels and the
implementation used on non-hot paths (SRS generation, verifier-side ops).
Curve parameters match halo2curves bn256 (reference pin:
shielder/Cargo.lock:454-456):

  G1:  y^2 = x^3 + 3        over Fq,  generator (1, 2)
  G2:  y^2 = x^3 + 3/(9+u)  over Fq2, u^2 = -1

Serialization (to_bytes/from_bytes) follows the halo2curves compressed form:
32 LE bytes of x with the y-parity flag in the top bit of the last byte;
the identity is all zeros.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import FQ_MODULUS, FR_MODULUS, Fq

P = FQ_MODULUS
B_G1 = 3


# ---------------------------------------------------------------------------
# G1 (affine ints; None coordinates = identity)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class G1:
    """Affine G1 point; (x=None) encodes the identity."""

    x: int | None = None
    y: int | None = None

    @property
    def is_identity(self) -> bool:
        return self.x is None

    @staticmethod
    def generator() -> "G1":
        return G1(1, 2)

    @staticmethod
    def identity() -> "G1":
        return G1()

    def is_on_curve(self) -> bool:
        if self.is_identity:
            return True
        return (self.y * self.y - (pow(self.x, 3, P) + B_G1)) % P == 0

    def neg(self) -> "G1":
        if self.is_identity:
            return self
        return G1(self.x, (-self.y) % P)

    def add(self, other: "G1") -> "G1":
        if self.is_identity:
            return other
        if other.is_identity:
            return self
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        if x1 == x2:
            if (y1 + y2) % P == 0:
                return G1.identity()
            # doubling
            lam = (3 * x1 * x1) * pow(2 * y1, P - 2, P) % P
        else:
            lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
        x3 = (lam * lam - x1 - x2) % P
        y3 = (lam * (x1 - x3) - y1) % P
        return G1(x3, y3)

    def double(self) -> "G1":
        return self.add(self)

    def mul(self, k: int) -> "G1":
        k %= FR_MODULUS
        result, addend = G1.identity(), self
        while k:
            if k & 1:
                result = result.add(addend)
            addend = addend.add(addend)
            k >>= 1
        return result

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        if self.is_identity:
            return b"\x00" * 32
        xb = bytearray(self.x.to_bytes(32, "little"))
        xb[31] |= (self.y & 1) << 7
        return bytes(xb)

    @staticmethod
    def from_bytes(data: bytes) -> "G1":
        if data == b"\x00" * 32:
            return G1.identity()
        b = bytearray(data)
        sign = (b[31] >> 7) & 1
        b[31] &= 0x7F
        x = int.from_bytes(bytes(b), "little")
        y2 = (pow(x, 3, P) + B_G1) % P
        y = Fq.sqrt(y2)
        if y is None:
            raise ValueError("invalid point encoding")
        if y & 1 != sign:
            y = P - y
        return G1(x, y)


def g1_msm(points: list[G1], scalars: list[int]) -> G1:
    """Host reference MSM (windowed, exact) — the device-MSM oracle."""
    assert len(points) == len(scalars)
    acc = G1.identity()
    for pt, s in zip(points, scalars):
        acc = acc.add(pt.mul(s))
    return acc


# ---------------------------------------------------------------------------
# Fq2 / G2 (needed for KZG verification via pairings)
# ---------------------------------------------------------------------------


def fq2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fq2_mul(a, b):
    # (a0 + a1 u)(b0 + b1 u), u^2 = -1
    t0 = a[0] * b[0] % P
    t1 = a[1] * b[1] % P
    t2 = (a[0] + a[1]) * (b[0] + b[1]) % P
    return ((t0 - t1) % P, (t2 - t0 - t1) % P)


def fq2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def fq2_inv(a):
    # 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 + a1^2)
    norm = (a[0] * a[0] + a[1] * a[1]) % P
    ninv = pow(norm, P - 2, P)
    return (a[0] * ninv % P, (-a[1]) * ninv % P)


def fq2_sqrt(a):
    """Square root in Fq2 (u^2 = -1) or None if a is a non-residue.

    Complex method: with a = c0 + c1 u, |a| = c0^2 + c1^2 must be a square
    in Fq; writing s = sqrt(|a|), the root is y0 + y1 u with
    y0^2 = (c0 + s)/2 (or (c0 - s)/2) and y1 = c1 / (2 y0).
    """
    c0, c1 = a[0] % P, a[1] % P
    if c1 == 0:
        y0 = Fq.sqrt(c0)
        if y0 is not None:
            return (y0, 0)
        # c0 is a non-residue: sqrt = y1 * u with y1^2 = -c0
        y1 = Fq.sqrt((-c0) % P)
        return None if y1 is None else (0, y1)
    s = Fq.sqrt((c0 * c0 + c1 * c1) % P)
    if s is None:
        return None
    inv2 = pow(2, P - 2, P)
    y0 = Fq.sqrt((c0 + s) * inv2 % P)
    if y0 is None:
        y0 = Fq.sqrt((c0 - s) * inv2 % P)
        if y0 is None:
            return None
    y1 = c1 * pow(2 * y0 % P, P - 2, P) % P
    return (y0, y1)


FQ2_ZERO = (0, 0)
FQ2_ONE = (1, 0)

# b' = 3 / (9 + u)
B_G2 = fq2_mul((3, 0), fq2_inv((9, 1)))

G2_GENERATOR_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GENERATOR_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)


@dataclass(frozen=True)
class G2:
    x: tuple | None = None
    y: tuple | None = None

    @property
    def is_identity(self) -> bool:
        return self.x is None

    @staticmethod
    def generator() -> "G2":
        return G2(G2_GENERATOR_X, G2_GENERATOR_Y)

    @staticmethod
    def identity() -> "G2":
        return G2()

    def is_on_curve(self) -> bool:
        if self.is_identity:
            return True
        lhs = fq2_mul(self.y, self.y)
        rhs = fq2_add(fq2_mul(fq2_mul(self.x, self.x), self.x), B_G2)
        return lhs == rhs

    def neg(self) -> "G2":
        if self.is_identity:
            return self
        return G2(self.x, fq2_neg(self.y))

    def add(self, other: "G2") -> "G2":
        if self.is_identity:
            return other
        if other.is_identity:
            return self
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        if x1 == x2:
            if fq2_add(y1, y2) == FQ2_ZERO:
                return G2.identity()
            num = fq2_mul((3, 0), fq2_mul(x1, x1))
            den = fq2_inv(fq2_add(y1, y1))
        else:
            num = fq2_sub(y2, y1)
            den = fq2_inv(fq2_sub(x2, x1))
        lam = fq2_mul(num, den)
        x3 = fq2_sub(fq2_sub(fq2_mul(lam, lam), x1), x2)
        y3 = fq2_sub(fq2_mul(lam, fq2_sub(x1, x3)), y1)
        return G2(x3, y3)

    def mul(self, k: int) -> "G2":
        k %= FR_MODULUS
        result, addend = G2.identity(), self
        while k:
            if k & 1:
                result = result.add(addend)
            addend = addend.add(addend)
            k >>= 1
        return result

    # -- serialization (halo2curves-style compressed: 64 bytes) ----------
    def to_bytes(self) -> bytes:
        """x.c0 || x.c1 as LE 32-byte reprs, y-parity (of y.c0) flag in the
        top bit of the final byte; identity is all zeros."""
        if self.is_identity:
            return b"\x00" * 64
        out = bytearray(self.x[0].to_bytes(32, "little"))
        out += self.x[1].to_bytes(32, "little")
        out[63] |= (self.y[0] & 1) << 7
        return bytes(out)

    @staticmethod
    def from_bytes(data: bytes) -> "G2":
        if len(data) != 64:
            raise ValueError("G2 encoding must be 64 bytes")
        if data == b"\x00" * 64:
            return G2.identity()
        b = bytearray(data)
        sign = (b[63] >> 7) & 1
        b[63] &= 0x7F
        x = (
            int.from_bytes(bytes(b[:32]), "little"),
            int.from_bytes(bytes(b[32:]), "little"),
        )
        if x[0] >= P or x[1] >= P:
            raise ValueError("invalid G2 x coordinate")
        y2 = fq2_add(fq2_mul(fq2_mul(x, x), x), B_G2)
        y = fq2_sqrt(y2)
        if y is None:
            raise ValueError("invalid point encoding")
        if y[0] & 1 != sign:
            y = fq2_neg(y)
        pt = G2(x, y)
        if not pt.is_on_curve():
            raise ValueError("point not on curve")
        return pt
