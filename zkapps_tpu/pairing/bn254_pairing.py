"""BN254 optimal-ate pairing (host side) for KZG verification.

The reference verifies KZG openings with BN254 pairings inside halo2_proofs /
halo2curves (SURVEY.md §3.5, X1/X2).  Pairing is a verifier-side operation —
never on the proving hot path — so an exact Python implementation is the
right tool (device kernels would buy nothing here).

Representation: Fq12 = Fq[w] / (w^12 - 18 w^6 + 82).  This is the standard
"tower-free" model of the BN254 extension: with u^2 = -1 and the sextic twist
residue xi = 9 + u, the embedding Fq2 -> Fq12 is u |-> w^6 - 9 (indeed
(w^6 - 9)^2 = w^12 - 18 w^6 + 81 = -1 in the quotient).  G2 points on the
twist E'(Fq2): y^2 = x^3 + 3/xi are untwisted into E(Fq12) via
(x, y) |-> (x * w^2, y * w^3).

The Miller loop runs over ate_loop_count = 6x+2 (x = 4965661367192848881) in
plain double-and-add with two Frobenius correction steps; the final
exponentiation is the direct f^((q^12-1)/r) power — slower than the
cyclotomic decomposition but unconditionally correct.
"""

from __future__ import annotations

from ..curve.host import G1, G2
from ..fields.host import FQ_MODULUS as Q, FR_MODULUS as R

BN_X = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_X + 2  # 29793968203157093288 (65 bits)
LOG_ATE_LOOP_COUNT = 63  # iterate bits 63..0; R=Q covers the MSB (bit 64)

DEG = 12
# w^12 = 18 w^6 - 82
_MOD_TAIL = [-82] + [0] * 5 + [18] + [0] * 5  # coeffs of w^12 in basis w^0..w^11


# ---------------------------------------------------------------------------
# Fq12 arithmetic on coefficient tuples (length 12, ints mod Q)
# ---------------------------------------------------------------------------

FQ12_ZERO = (0,) * 12
FQ12_ONE = (1,) + (0,) * 11


def f12_add(a, b):
    return tuple((x + y) % Q for x, y in zip(a, b))


def f12_sub(a, b):
    return tuple((x - y) % Q for x, y in zip(a, b))


def f12_neg(a):
    return tuple((-x) % Q for x in a)


def f12_scale(a, k):
    return tuple(x * k % Q for x in a)


def f12_mul(a, b):
    prod = [0] * (2 * DEG - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                prod[i + j] += ai * bj
    # reduce degrees 22..12 via w^12 = 18 w^6 - 82
    for d in range(2 * DEG - 2, DEG - 1, -1):
        c = prod[d]
        if c:
            prod[d] = 0
            prod[d - 6] += 18 * c
            prod[d - 12] -= 82 * c
    return tuple(x % Q for x in prod[:DEG])


def f12_square(a):
    return f12_mul(a, a)


def f12_pow(a, e: int):
    result = FQ12_ONE
    base = a
    while e:
        if e & 1:
            result = f12_mul(result, base)
        base = f12_mul(base, base)
        e >>= 1
    return result


def _poly_divmod(num: list[int], den: list[int]):
    """Polynomial division over Fq (lists low->high, den monic-izable)."""
    num = list(num)
    deg_d = len(den) - 1
    while deg_d >= 0 and den[deg_d] == 0:
        deg_d -= 1
    inv_lead = pow(den[deg_d], Q - 2, Q)
    quot = [0] * (max(len(num) - deg_d, 1))
    for d in range(len(num) - 1, deg_d - 1, -1):
        if num[d] == 0:
            continue
        coef = num[d] * inv_lead % Q
        quot[d - deg_d] = coef
        for i in range(deg_d + 1):
            num[d - deg_d + i] = (num[d - deg_d + i] - coef * den[i]) % Q
    return quot, num


def f12_inv(a):
    """Extended Euclid in Fq[X] mod (X^12 - 18 X^6 + 82)."""
    mod_poly = [(-c) % Q for c in _MOD_TAIL] + [1]  # X^12 - 18X^6 + 82
    # invariants: lm*a + ?*mod = low ; hm*a + ?*mod = high
    lm, hm = [1] + [0] * 12, [0] * 13
    low, high = list(a) + [0], mod_poly
    while _poly_deg(low) > 0:
        quot, rem = _poly_divmod(high, low)
        nm = [0] * 13
        for i, q in enumerate(quot):
            if q:
                for j, l in enumerate(lm):
                    if i + j < 13 and l:
                        nm[i + j] = (nm[i + j] - q * l) % Q
        nm = [(h + n) % Q for h, n in zip(hm, nm)]
        low, lm, high, hm = rem[:13] + [0] * (13 - len(rem)), nm, low, lm
    inv_c = pow(low[0], Q - 2, Q)
    return tuple(x * inv_c % Q for x in lm[:DEG])


def _poly_deg(p):
    for d in range(len(p) - 1, -1, -1):
        if p[d] % Q != 0:
            return d
    return -1


def f12_div(a, b):
    return f12_mul(a, f12_inv(b))


# ---------------------------------------------------------------------------
# Twisting into E(Fq12)
# ---------------------------------------------------------------------------


def _fq2_to_fq12(c: tuple[int, int]):
    """a + b*u  |->  (a - 9b) + b*w^6."""
    out = [0] * 12
    out[0] = (c[0] - 9 * c[1]) % Q
    out[6] = c[1] % Q
    return tuple(out)


def twist_g2(pt: G2):
    """E'(Fq2) -> E(Fq12): (x, y) |-> (x w^2, y w^3)."""
    assert not pt.is_identity
    x12 = _fq2_to_fq12(pt.x)
    y12 = _fq2_to_fq12(pt.y)
    w2 = tuple(1 if i == 2 else 0 for i in range(12))
    w3 = tuple(1 if i == 3 else 0 for i in range(12))
    return (f12_mul(x12, w2), f12_mul(y12, w3))


def cast_g1(pt: G1):
    assert not pt.is_identity
    return (
        tuple([pt.x] + [0] * 11),
        tuple([pt.y] + [0] * 11),
    )


# ---------------------------------------------------------------------------
# E(Fq12) affine group law + line functions
# ---------------------------------------------------------------------------


def _ec_double(pt):
    x, y = pt
    m = f12_div(f12_scale(f12_mul(x, x), 3), f12_scale(y, 2))
    nx = f12_sub(f12_mul(m, m), f12_scale(x, 2))
    ny = f12_sub(f12_mul(m, f12_sub(x, nx)), y)
    return (nx, ny)


def _ec_add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and y1 == y2:
        return _ec_double(p1)
    m = f12_div(f12_sub(y2, y1), f12_sub(x2, x1))
    nx = f12_sub(f12_sub(f12_mul(m, m), x1), x2)
    ny = f12_sub(f12_mul(m, f12_sub(x1, nx)), y1)
    return (nx, ny)


def _linefunc(p1, p2, t):
    """Evaluate the line through p1, p2 at point t."""
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 != x2:
        m = f12_div(f12_sub(y2, y1), f12_sub(x2, x1))
    elif y1 == y2:
        m = f12_div(f12_scale(f12_mul(x1, x1), 3), f12_scale(y1, 2))
    else:
        return f12_sub(xt, x1)
    return f12_sub(f12_mul(m, f12_sub(xt, x1)), f12_sub(yt, y1))


# ---------------------------------------------------------------------------
# Miller loop + final exponentiation
# ---------------------------------------------------------------------------

FINAL_EXP = (Q**12 - 1) // R


def miller_loop(q_pt, p_pt):
    qx, qy = q_pt
    r_pt = q_pt
    f = FQ12_ONE
    for i in range(LOG_ATE_LOOP_COUNT, -1, -1):
        f = f12_mul(f12_square(f), _linefunc(r_pt, r_pt, p_pt))
        r_pt = _ec_double(r_pt)
        if ATE_LOOP_COUNT & (1 << i):
            f = f12_mul(f, _linefunc(r_pt, q_pt, p_pt))
            r_pt = _ec_add(r_pt, q_pt)
    # Frobenius correction steps.
    q1 = (f12_pow(qx, Q), f12_pow(qy, Q))
    nq2 = (f12_pow(q1[0], Q), f12_neg(f12_pow(q1[1], Q)))
    f = f12_mul(f, _linefunc(r_pt, q1, p_pt))
    r_pt = _ec_add(r_pt, q1)
    f = f12_mul(f, _linefunc(r_pt, nq2, p_pt))
    return f


def pairing(p: G1, q: G2):
    """e(P, Q) in the r-th roots of unity of Fq12.  Identity inputs -> 1."""
    if p.is_identity or q.is_identity:
        return FQ12_ONE
    assert p.is_on_curve() and q.is_on_curve()
    f = miller_loop(twist_g2(q), cast_g1(p))
    return f12_pow(f, FINAL_EXP)


def pairing_check(pairs: list[tuple[G1, G2]]) -> bool:
    """prod e(P_i, Q_i) == 1 — the multi-pairing product check."""
    acc = FQ12_ONE
    for p, q in pairs:
        if p.is_identity or q.is_identity:
            continue
        acc = f12_mul(acc, miller_loop(twist_g2(q), cast_g1(p)))
    return f12_pow(acc, FINAL_EXP) == FQ12_ONE
