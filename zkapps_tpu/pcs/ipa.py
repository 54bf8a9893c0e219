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


def _ipa_tree_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Field tree-reduce over axis 0 (length a power of two) -> (16,)."""
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = FR.add(x[:half], x[half : 2 * half])
    return x[0]


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

        All per-round folds (a, b, the running original-index factor s and
        the masked L/R scalar vectors) are DEVICE field ops on (n,16) limb
        arrays — the CPU reference's pointwise folds are O(n) host bigint
        loops per round, unusable at prover scale.  Host work per round is
        the transcript + two scalar decodes.

        ``blind_rng``: optional callable -> int for per-round L/R blinds
        (None = deterministic, zero blinds; commitment blind may still be
        nonzero)."""
        from ..ntt.jnp_ntt import powers_device

        p = Fr.p
        params = self.params
        n = params.n
        a = _pad_coeffs(params, coeffs_mont)  # (n,16) Montgomery
        b = powers_device(FR, FR.encode_scalar(z), n)
        v = FR.decode_scalar(_ipa_tree_sum(FR.mul(a, b)))

        transcript.common_scalar(v)
        xi = transcript.squeeze_challenge()
        u_prime = params.u.mul(xi)

        s = jnp.broadcast_to(FR.one_mont, (n, 16))
        f_blind = blind
        m = n
        while m > 1:
            h = m // 2
            # masked original-basis scalars: w_l[k] = s_k * a[(k mod m) + h]
            # for k mod m < h (w_r symmetric) — pure reshape/broadcast
            s_mat = s.reshape(n // m, m, 16)
            a_lo, a_hi = a[:h], a[h:m]
            b_lo, b_hi = b[:h], b[h:m]
            w_l = jnp.concatenate(
                [FR.mul(s_mat[:, :h], a_hi[None]), jnp.zeros_like(s_mat[:, h:])],
                axis=1,
            ).reshape(n, 16)
            w_r = jnp.concatenate(
                [jnp.zeros_like(s_mat[:, :h]), FR.mul(s_mat[:, h:], a_lo[None])],
                axis=1,
            ).reshape(n, 16)
            ip_l = FR.decode_scalar(_ipa_tree_sum(FR.mul(a_hi, b_lo)))
            ip_r = FR.decode_scalar(_ipa_tree_sum(FR.mul(a_lo, b_hi)))
            l_pt = self._msm_mont(w_l).add(u_prime.mul(ip_l))
            r_pt = self._msm_mont(w_r).add(u_prime.mul(ip_r))
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
            u_m = FR.encode_scalar(u_j)[None]
            u_inv_m = FR.encode_scalar(u_inv)[None]
            a = FR.add(a_lo, FR.mul(u_m, a_hi))
            b = FR.add(b_lo, FR.mul(u_inv_m, b_hi))
            s = jnp.concatenate(
                [s_mat[:, :h], FR.mul(s_mat[:, h:], u_inv_m)], axis=1
            ).reshape(n, 16)
            f_blind = (f_blind + u_j * lb + u_inv * rb) % p
            m = h

        transcript.write_scalar(FR.decode_scalar(a[0]))
        transcript.write_scalar(f_blind)
        return v

    def _msm_mont(self, scalars_mont: jnp.ndarray) -> G1:
        return msm_to_host(self.params.g, FR.from_mont(scalars_mont))

    def _msm_host_scalars(self, scalars: list[int]) -> G1:
        arr = FR.encode(scalars, mont=False)
        return msm_to_host(self.params.g, arr)

    # -- verify --------------------------------------------------------------
    def verify(self, transcript: Blake2bRead, commitment: G1, z: int, v: int) -> bool:
        from ..ntt.jnp_ntt import powers_device

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

        # s_k = prod_j u_j^{-bit}, round j splits on bit log_n-1-j of k —
        # device: one masked multiply per round on the (n,16) limb array
        s = jnp.broadcast_to(FR.one_mont, (n, 16))
        idx = jnp.arange(n, dtype=jnp.uint32)
        for j, (_, u_inv) in enumerate(challenges):
            bit = params.log_n - 1 - j
            mask = ((idx >> bit) & 1) > 0
            s = FR.select(mask, FR.mul(s, FR.encode_scalar(u_inv)[None]), s)
        g0 = self._msm_mont(s)
        zpows = powers_device(FR, FR.encode_scalar(z), n)
        b0 = FR.decode_scalar(_ipa_tree_sum(FR.mul(s, zpows)))

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


class IPACommitter:
    """Drop-in PCS for the PLONK pipeline (duck-type of pcs.kzg.KZG).

    Selected via ``plonk.keygen(..., pcs="ipa")`` — the reference ships IPA
    as a first-class commitment scheme inside halo2_proofs (`poly/ipa`,
    SURVEY.md §2.2 X2).  Commitments are UNBLINDED Pedersen commits
    (hiding comes from the PLONK layer's Z_H blinding of every
    witness-carrying polynomial); openings use the GWC-style per-point
    aggregation + one IPA argument per point.
    """

    def __init__(self, params: IPAParams):
        self.params = params
        self.ipa = IPA(params)
        self.n = params.n
        self.mesh = None

    def set_mesh(self, mesh) -> None:
        # point-axis sharding of the Pedersen MSMs is handled inside
        # msm_to_host's kernels; mesh-parallel IPA rounds are future work
        self.mesh = mesh

    # -- commits ---------------------------------------------------------
    def commit(self, coeffs_mont: jnp.ndarray) -> G1:
        return self.ipa.commit(coeffs_mont)

    def commit_many(self, coeffs_list: list) -> list[G1]:
        from ..msm.jnp_msm import msm_many_to_host

        if len(coeffs_list) == 1:
            return [self.commit(coeffs_list[0])]
        stack = jnp.stack([_pad_coeffs(self.params, c) for c in coeffs_list])
        return msm_many_to_host(self.params.g, FR.from_mont(stack))

    # -- evaluations (same fused batch as KZG) ---------------------------
    def eval_poly(self, coeffs_mont: jnp.ndarray, z: int) -> int:
        from .kzg import KZG

        return KZG.eval_poly(self, coeffs_mont, z)

    def eval_many(self, jobs: list) -> list[int]:
        from .kzg import KZG

        return KZG.eval_many(self, jobs)

    @staticmethod
    def _log_size(length: int, floor_log: int) -> int:
        from .kzg import KZG

        return KZG._log_size(length, floor_log)

    # -- multiopen (GWC aggregation over IPA arguments) -------------------
    def multiopen_prove(self, transcript, polys, queries) -> None:
        self.ipa.multiopen_prove(transcript, polys, queries)

    def multiopen_verify(self, transcript, commitments, queries) -> bool:
        return self.ipa.multiopen_verify(transcript, commitments, queries)


