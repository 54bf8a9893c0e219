"""KZG polynomial commitment scheme on BN254 (TPU compute path).

Commit = Pippenger MSM of coefficients against the SRS powers (the hot path,
SURVEY.md §3.5 "COMMIT"); openings use the evaluation-domain quotient trick:
(f(X)-y)/(X-z) is interpolated from pointwise division on the NTT domain —
one forward NTT + one batched inversion + one inverse NTT, all vectorized —
instead of the serial synthetic-division recurrence the CPU reference uses.

Multi-point openings follow the GWC (Gonzalez-Williams-Ceccon, as in
halo2_proofs' ProverGWC) aggregation: polys opened at the same point are
combined with powers of challenge v, per-point witnesses W_j are committed,
and the verifier checks the u-combined double pairing

    e(sum_j u^j W_j, [s]G2)  ==  e(sum_j u^j (z_j W_j + F_j - e_j G1), G2).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curve.host import G1
from ..curve.jnp_point import G1_JNP
from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..msm.jnp_msm import msm
from ..ntt.jnp_ntt import get_plan, powers_device
from ..pairing.bn254_pairing import pairing_check
from ..transcript.blake2b import Blake2bRead, Blake2bWrite
from .srs import SRS


def _tree_sum(f, x):
    """Field tree-reduce over axis 0 (length power of two)."""
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = f.add(x[:half], x[half : 2 * half])
    return x[0]


class KZG:
    def __init__(self, srs: SRS, log_n: int):
        assert (1 << log_n) <= srs.n
        self.srs = srs
        self.log_n = log_n
        self.n = 1 << log_n
        self.plan = get_plan(log_n)
        # Full domain power table [omega^i] for quotient denominators.
        self.domain = powers_device(FR, FR.encode_scalar(self.plan.omega), self.n)

    # -- core ops --------------------------------------------------------
    def commit(self, coeffs_mont: jnp.ndarray) -> G1:
        """coeffs (n,16) Montgomery -> commitment point (host affine)."""
        scalars_std = FR.from_mont(coeffs_mont)
        out = msm(self.srs.g1_powers[: coeffs_mont.shape[0]], scalars_std)
        return G1_JNP.decode(out[None])[0]

    def eval_poly(self, coeffs_mont: jnp.ndarray, z: int) -> int:
        """f(z) via power-table dot + tree reduction."""
        zpows = powers_device(FR, FR.encode_scalar(z), self.n)
        prod = FR.mul(coeffs_mont, zpows[: coeffs_mont.shape[0]])
        return FR.decode_scalar(_tree_sum(FR, prod))

    def quotient(self, coeffs_mont: jnp.ndarray, z: int, y: int) -> jnp.ndarray:
        """(f(X) - y) / (X - z) as (n,16) Montgomery coefficients.

        Requires z outside the evaluation domain (true w.h.p. for
        transcript challenges).
        """
        f = FR
        coeffs = coeffs_mont
        if coeffs.shape[0] < self.n:
            pad = jnp.zeros((self.n - coeffs.shape[0], coeffs.shape[1]), dtype=coeffs.dtype)
            coeffs = jnp.concatenate([coeffs, pad], axis=0)
        evals = self.plan.forward(coeffs)
        y_m = f.encode_scalar(y)
        z_m = f.encode_scalar(z)
        denom = f.sub(self.domain, z_m[None])
        q_evals = f.mul(f.sub(evals, y_m[None]), f.batch_inv(denom))
        return self.plan.inverse(q_evals)

    def open_single(self, coeffs_mont: jnp.ndarray, z: int) -> tuple[int, G1]:
        """Returns (y = f(z), witness commitment W)."""
        y = self.eval_poly(coeffs_mont, z)
        q = self.quotient(coeffs_mont, z, y)
        return y, self.commit(q)

    # -- single-point verification (pairing) -----------------------------
    def verify_single(self, commitment: G1, z: int, y: int, witness: G1) -> bool:
        """e(C - yG1, G2) == e(W, [s]G2 - zG2) via product-of-pairings."""
        lhs = commitment.add(G1.generator().mul(y).neg())
        # e(lhs, G2) * e(-W, sG2 - zG2) == 1
        s_minus_z_g2 = self.srs.s_g2.add(self.srs.g2.mul(z).neg())
        return pairing_check([(lhs, self.srs.g2), (witness.neg(), s_minus_z_g2)])

    # -- GWC multiopen ----------------------------------------------------
    def multiopen_prove(
        self,
        transcript: Blake2bWrite,
        polys: list[jnp.ndarray],
        queries: list[tuple[int, list[tuple[int, int]]]],
    ) -> None:
        """queries: [(z, [(poly_idx, y), ...]), ...]; y values must already be
        in the transcript (written by the outer protocol)."""
        v = transcript.squeeze_challenge()
        witnesses = []
        for z, opens in queries:
            # h = sum_i v^i * poly_i  (i = order within this point's list)
            h = None
            vi = 1
            y_comb = 0
            for poly_idx, y in opens:
                term = FR.mul(polys[poly_idx], FR.encode_scalar(vi)[None])
                h = term if h is None else FR.add(h, term)
                y_comb = (y_comb + vi * y) % Fr.p
                vi = vi * v % Fr.p
            q = self.quotient(h, z, y_comb)
            witnesses.append(self.commit(q))
        for w in witnesses:
            transcript.write_point(w)

    def multiopen_verify(
        self,
        transcript: Blake2bRead,
        commitments: list[G1],
        queries: list[tuple[int, list[tuple[int, int]]]],
    ) -> bool:
        v = transcript.squeeze_challenge()
        witnesses = [transcript.read_point() for _ in queries]
        u = transcript.squeeze_challenge()

        w_comb = G1.identity()  # sum u^j W_j
        rhs_comb = G1.identity()  # sum u^j (z_j W_j + F_j - e_j G1)
        uj = 1
        for (z, opens), w in zip(queries, witnesses):
            f_j = G1.identity()
            e_j = 0
            vi = 1
            for poly_idx, y in opens:
                f_j = f_j.add(commitments[poly_idx].mul(vi))
                e_j = (e_j + vi * y) % Fr.p
                vi = vi * v % Fr.p
            term = w.mul(z).add(f_j).add(G1.generator().mul(e_j).neg())
            w_comb = w_comb.add(w.mul(uj))
            rhs_comb = rhs_comb.add(term.mul(uj))
            uj = uj * u % Fr.p
        # e(w_comb, sG2) == e(rhs_comb, G2)
        return pairing_check([(w_comb, self.srs.s_g2), (rhs_comb.neg(), self.srs.g2)])
