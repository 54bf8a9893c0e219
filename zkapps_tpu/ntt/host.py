"""Host-side NTT reference (exact) — oracle for the device kernels.

The reference's proving backend evaluates polynomials over radix-2 multiplicative
subgroups of Fr (halo2_proofs FFT; SURVEY.md §3.5).  This module provides the
naive O(n^2) evaluation and a recursive radix-2 transform for test vectors.
"""

from __future__ import annotations

from ..fields.host import Fr


def naive_eval(coeffs: list[int], points: list[int], p: int = Fr.p) -> list[int]:
    out = []
    for x in points:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        out.append(acc)
    return out


def ntt_host(coeffs: list[int], inverse: bool = False, p: int = Fr.p) -> list[int]:
    """Recursive radix-2 NTT: coeffs -> evaluations at omega^i (natural order)."""
    n = len(coeffs)
    assert n & (n - 1) == 0
    log_n = n.bit_length() - 1
    omega = Fr.root_of_unity(log_n)
    if inverse:
        omega = pow(omega, p - 2, p)

    def rec(a, w):
        m = len(a)
        if m == 1:
            return a
        even = rec(a[::2], w * w % p)
        odd = rec(a[1::2], w * w % p)
        out = [0] * m
        wj = 1
        for j in range(m // 2):
            t = wj * odd[j] % p
            out[j] = (even[j] + t) % p
            out[j + m // 2] = (even[j] - t) % p
            wj = wj * w % p
        return out

    res = rec(list(coeffs), omega)
    if inverse:
        n_inv = pow(n, p - 2, p)
        res = [x * n_inv % p for x in res]
    return res
