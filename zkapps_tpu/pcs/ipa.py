"""IPA (inner-product argument) polynomial commitment on BN254 G1.

The reference's proving stack ships two commitment schemes: KZG and IPA
(halo2_proofs `poly/{kzg,ipa}`; SURVEY.md §2.2 X2).  This is the IPA half:
a transparent (no trusted setup) Pedersen vector commitment opened with the
bulletproofs-style log-round inner-product argument.

Protocol (prover, opening p at z with v = p(z)):

    P  = MSM(a, G) + blind*W            a = coefficients, G = fixed basis
    xi = challenge;  U' = xi*U          ties the claim <a, b> = v, b_i = z^i
    P0 = P + v*U'
    per round j (m = current length):
        L_j = MSM(a_hi, G_lo) + <a_hi, b_lo>*U' (+ l_j*W)
        R_j = MSM(a_lo, G_hi) + <a_lo, b_hi>*U' (+ r_j*W)
        u_j = challenge
        a <- a_lo + u_j*a_hi;  b <- b_lo + u_j^-1*b_hi;  G <- G_lo + u_j^-1*G_hi
    send a0 (final scalar) and f (accumulated blind)
    verifier: P0 + sum(u_j*L_j + u_j^-1*R_j) == a0*G0 + a0*b0*U' + f*W
    where G0 = MSM(s, G), s_k = prod_j u_j^{-bit_j(k)} (bit_j = the bit that
    round j split on, MSB first), and b0 = <s-fold of b>.

TPU-native twist: the prover NEVER materializes the folded basis (the CPU
reference folds G pointwise every round — O(n) full scalar-muls, ~256n point
ops).  Since the round-j folded basis is G^(j)_i = sum_{k = i mod m} s_k G_k,
each L/R is an MSM over the ORIGINAL basis with masked scalars
w_k = s_k * a[...], so the whole argument is log2(n) Pippenger MSMs on the
fixed SRS — the kernel this backend is already fast at — plus O(n) field ops
per round for the a/s folds.

Transcript layout is this backend's own (NOTES.md "known deviations"); the
blake2b primitive conventions match halo2_proofs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import jax.numpy as jnp

from ..curve.host import B_G1, G1, P as FQ_P
from ..curve.jnp_point import G1_JNP
from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..msm.jnp_msm import msm_to_host
from ..transcript.blake2b import Blake2bRead, Blake2bWrite


def _hash_to_curve(domain: bytes, index: int) -> G1:
    """Deterministic try-and-increment map to G1 (setup-time only).

    BN254 Fq has p = 3 mod 4, so sqrt = pow((p+1)/4).  Cofactor of G1 is 1,
    so any curve point is in the prime-order group.
    """
    ctr = 0
    while True:
        h = hashlib.blake2b(
            domain + index.to_bytes(8, "little") + ctr.to_bytes(8, "little"),
            digest_size=32,
        ).digest()
        x = int.from_bytes(h, "little") % FQ_P
        rhs = (pow(x, 3, FQ_P) + B_G1) % FQ_P
        y = pow(rhs, (FQ_P + 1) // 4, FQ_P)
        if y * y % FQ_P == rhs:
            # canonical parity choice: even y
            if y % 2:
                y = FQ_P - y
            return G1(x, y)
        ctr += 1


@dataclass
class IPAParams:
    """Transparent commitment key: n basis points + W (blind) + U (value)."""

    log_n: int
    g: jnp.ndarray  # (n, 3, 16) device projective Montgomery
    g_host: list[G1]
    w: G1
    u: G1

    @property
    def n(self) -> int:
        return 1 << self.log_n


_PARAMS_CACHE: dict[tuple[int, bytes], IPAParams] = {}


def ipa_setup(log_n: int, seed: bytes = b"zkapps-tpu-ipa") -> IPAParams:
    key = (log_n, seed)
    if key not in _PARAMS_CACHE:
        g_host = [_hash_to_curve(seed + b"-g", i) for i in range(1 << log_n)]
        params = IPAParams(
            log_n=log_n,
            g=G1_JNP.encode(g_host),
            g_host=g_host,
            w=_hash_to_curve(seed + b"-w", 0),
            u=_hash_to_curve(seed + b"-u", 0),
        )
        _PARAMS_CACHE[key] = params
    return _PARAMS_CACHE[key]


def _pad_coeffs(params: IPAParams, coeffs_mont: jnp.ndarray) -> jnp.ndarray:
    n = params.n
    assert coeffs_mont.shape[0] <= n
    if coeffs_mont.shape[0] < n:
        pad = jnp.zeros((n - coeffs_mont.shape[0], 16), jnp.uint32)
        coeffs_mont = jnp.concatenate([coeffs_mont, pad], axis=0)
    return coeffs_mont


class IPA:
    def __init__(self, params: IPAParams):
        self.params = params

    # -- commit ------------------------------------------------------------
    def commit(self, coeffs_mont: jnp.ndarray, blind: int = 0) -> G1:
        """Pedersen commit: MSM(coeffs, G) + blind*W."""
        coeffs = _pad_coeffs(self.params, coeffs_mont)
        c = msm_to_host(self.params.g, FR.from_mont(coeffs))
        if blind:
            c = c.add(self.params.w.mul(blind))
        return c

    # -- open (prover) -------------------------------------------------------
    def open(
        self,
        transcript: Blake2bWrite,
        coeffs_mont: jnp.ndarray,
        z: int,
        blind: int = 0,
        blind_rng=None,
    ) -> int:
        """Write an opening argument for p(z) to the transcript; returns v.

        ``blind_rng``: optional callable -> int for per-round L/R blinds
        (None = deterministic, zero blinds; commitment blind may still be
        nonzero)."""
        p = Fr.p
        params = self.params
        n = params.n
        a_host = FR.decode(coeffs_mont)
        a_host += [0] * (n - len(a_host))
        b_host = [pow(z, i, p) for i in range(n)]
        v = sum(ai * bi for ai, bi in zip(a_host, b_host)) % p

        transcript.common_scalar(v)
        xi = transcript.squeeze_challenge()
        u_prime = params.u.mul(xi)

        # running per-original-index factor s_k; folded a, b
        s_host = [1] * n
        a = list(a_host)
        b = list(b_host)
        f_blind = blind
        m = n
        while m > 1:
            h = m // 2
            # masked original-basis scalars for L and R
            w_l = [0] * n
            w_r = [0] * n
            for k in range(n):
                i = k % m
                if i < h:
                    w_l[k] = s_host[k] * a[i + h] % p
                else:
                    w_r[k] = s_host[k] * a[i - h] % p
            ip_l = sum(a[i + h] * b[i] for i in range(h)) % p
            ip_r = sum(a[i] * b[i + h] for i in range(h)) % p
            l_pt = self._msm_host_scalars(w_l).add(u_prime.mul(ip_l))
            r_pt = self._msm_host_scalars(w_r).add(u_prime.mul(ip_r))
            if blind_rng is not None:
                lb, rb = blind_rng() % p, blind_rng() % p
            else:
                lb = rb = 0
            if lb:
                l_pt = l_pt.add(params.w.mul(lb))
            if rb:
                r_pt = r_pt.add(params.w.mul(rb))
            transcript.write_point(l_pt)
            transcript.write_point(r_pt)
            u_j = transcript.squeeze_challenge()
            u_inv = pow(u_j, p - 2, p)
            a = [(a[i] + u_j * a[i + h]) % p for i in range(h)]
            b = [(b[i] + u_inv * b[i + h]) % p for i in range(h)]
            for k in range(n):
                if k % m >= h:
                    s_host[k] = s_host[k] * u_inv % p
            f_blind = (f_blind + u_j * lb + u_inv * rb) % p
            m = h

        transcript.write_scalar(a[0])
        transcript.write_scalar(f_blind)
        return v

    def _msm_host_scalars(self, scalars: list[int]) -> G1:
        arr = FR.encode(scalars, mont=False)
        return msm_to_host(self.params.g, arr)

    # -- verify --------------------------------------------------------------
    def verify(self, transcript: Blake2bRead, commitment: G1, z: int, v: int) -> bool:
        p = Fr.p
        params = self.params
        n = params.n
        transcript.common_scalar(v)
        xi = transcript.squeeze_challenge()
        u_prime = params.u.mul(xi)

        acc = commitment.add(u_prime.mul(v))
        challenges = []
        m = n
        while m > 1:
            l_pt = transcript.read_point()
            r_pt = transcript.read_point()
            u_j = transcript.squeeze_challenge()
            if u_j % p == 0:
                return False
            u_inv = pow(u_j, p - 2, p)
            acc = acc.add(l_pt.mul(u_j)).add(r_pt.mul(u_inv))
            challenges.append((u_j, u_inv))
            m //= 2
        a0 = transcript.read_scalar()
        f_blind = transcript.read_scalar()

        # s_k = prod_j u_j^{-bit}, round j splits on bit log_n-1-j of k
        s = [1] * n
        for j, (_, u_inv) in enumerate(challenges):
            bit = params.log_n - 1 - j
            for k in range(n):
                if (k >> bit) & 1:
                    s[k] = s[k] * u_inv % p
        g0 = self._msm_host_scalars(s)
        b0 = sum(s[k] * pow(z, k, p) for k in range(n)) % p

        rhs = g0.mul(a0).add(u_prime.mul(a0 * b0 % p))
        if f_blind:
            rhs = rhs.add(params.w.mul(f_blind))
        return acc.to_bytes() == rhs.to_bytes()

    # -- multiopen (GWC-style v-combination per point) -----------------------
    def multiopen_prove(
        self,
        transcript: Blake2bWrite,
        polys: list[jnp.ndarray],
        queries: list[tuple[int, list[tuple[int, int]]]],
        blinds: list[int] | None = None,
    ) -> None:
        """queries: [(z, [(poly_idx, y), ...]), ...]; ys already in transcript.

        Combines same-point polys with powers of challenge v, then runs one
        IPA argument per point (the GWC aggregation of pcs/kzg.py applied to
        the IPA scheme, as halo2's IPA multiopen does with rotation sets)."""
        p = Fr.p
        vch = transcript.squeeze_challenge()
        for z, opens in queries:
            h = None
            b_comb = 0
            vi = 1
            for poly_idx, _y in opens:
                term = FR.mul(
                    _pad_coeffs(self.params, polys[poly_idx]),
                    FR.encode_scalar(vi)[None],
                )
                h = term if h is None else FR.add(h, term)
                if blinds is not None:
                    b_comb = (b_comb + vi * blinds[poly_idx]) % p
                vi = vi * vch % p
            self.open(transcript, h, z, blind=b_comb)

    def multiopen_verify(
        self,
        transcript: Blake2bRead,
        commitments: list[G1],
        queries: list[tuple[int, list[tuple[int, int]]]],
    ) -> bool:
        p = Fr.p
        vch = transcript.squeeze_challenge()
        for z, opens in queries:
            c_comb = G1.identity()
            y_comb = 0
            vi = 1
            for poly_idx, y in opens:
                c_comb = c_comb.add(commitments[poly_idx].mul(vi))
                y_comb = (y_comb + vi * y) % p
                vi = vi * vch % p
            if not self.verify(transcript, c_comb, z, y_comb):
                return False
        return True


