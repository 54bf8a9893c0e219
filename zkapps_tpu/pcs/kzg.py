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

SHPLONK (BDFG20, halo2_proofs' ProverSHPLONK — the reference's other
multiopen; SURVEY.md §2.2 X2) is also provided: polys are grouped into
rotation sets by their point set S_k, combined within sets by powers of y
and across sets by powers of v; a single witness

    h = [ sum_k v^k Z_{T \\ S_k} (q_k - r_k) ] / Z_T          -> commit W
    L(X) = sum_k v^k Z_{T\\S_k}(u) (q_k(X) - r_k(u)) - Z_T(u) h(X)
    W' = commit(L / (X - u)),   check e([L] + u W', G2) == e(W', [s]G2)

— two proof points total regardless of the number of queries (vs one per
point for GWC).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curve.host import G1
from ..curve.jnp_point import G1_JNP
from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..msm.jnp_msm import msm_to_host
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


# -- host polynomial helpers for SHPLONK (tiny degrees, int arithmetic) ----
def _poly_mul_host(a: list[int], b: list[int]) -> list[int]:
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % Fr.p
    return out


def _interp_coeffs(points: list[tuple[int, int]]) -> list[int]:
    """Lagrange interpolation through (z, y) pairs -> ascending coefficients."""
    p = Fr.p
    out = [0] * len(points)
    for j, (zj, yj) in enumerate(points):
        num = [1]
        den = 1
        for m, (zm, _) in enumerate(points):
            if m == j:
                continue
            num = _poly_mul_host(num, [(-zm) % p, 1])
            den = den * (zj - zm) % p
        scale = yj * pow(den, p - 2, p) % p
        for i, c in enumerate(num):
            out[i] = (out[i] + scale * c) % p
    return out


def _poly_eval_host(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % Fr.p
    return acc


def _rotation_sets(queries):
    """Group polys by their point set (halo2 rotation sets).

    queries: [(z, [(poly_idx, y), ...]), ...] ->
    [(points: [z...], members: [(poly_idx, [(z, y)...])...]), ...], with
    deterministic ordering (poly index, then first appearance) so prover and
    verifier derive identical groupings."""
    by_poly: dict[int, list[tuple[int, int]]] = {}
    for z, opens in queries:
        for idx, yv in opens:
            by_poly.setdefault(idx, []).append((z, yv))
    sets: dict[tuple[int, ...], list] = {}
    order: list[tuple[int, ...]] = []
    for idx in sorted(by_poly):
        pts = tuple(z for z, _ in by_poly[idx])
        if pts not in sets:
            sets[pts] = []
            order.append(pts)
        sets[pts].append((idx, by_poly[idx]))
    return [(list(pts), sets[pts]) for pts in order]


class KZG:
    def __init__(self, srs: SRS, log_n: int):
        assert (1 << log_n) <= srs.n
        self.srs = srs
        self.log_n = log_n
        self.n = 1 << log_n
        self.plan = get_plan(log_n)
        # Full domain power table [omega^i] for quotient denominators,
        # cached per domain size (blinded polys exceed degree n-1).
        self._domains: dict[int, jnp.ndarray] = {}
        # When set (plonk.prove(mesh=...)), commits shard the point axis
        # over the mesh via the bucket-exchange MSM (rayon-analog).
        self.mesh = None

    def set_mesh(self, mesh) -> None:
        self.mesh = mesh

    def _commit_mesh(self, coeffs_mont: jnp.ndarray) -> G1:
        """Point-axis-sharded commit: bucket-exchange MSM over the mesh."""
        import numpy as np

        from ..msm.distributed import msm_bucket_exchange
        from ..msm.jnp_msm import default_window_bits
        from ..parallel.mesh import shard_leading

        d = self.mesh.size
        length = coeffs_mont.shape[0]
        lp = -(-length // d) * d
        scal = FR.from_mont(coeffs_mont)
        pts = self.srs.g1_powers[:length]
        if lp != length:
            pts = jnp.concatenate(
                [pts, G1_JNP.encode([G1.identity()] * (lp - length))], axis=0
            )
            scal = jnp.concatenate(
                [scal, jnp.zeros((lp - length, scal.shape[1]), scal.dtype)], axis=0
            )
        out = msm_bucket_exchange(
            self.mesh,
            shard_leading(self.mesh, pts),
            shard_leading(self.mesh, scal),
            c=default_window_bits(lp),
        )
        return G1_JNP.decode(np.asarray(out)[None])[0]

    def _domain(self, log_m: int) -> jnp.ndarray:
        if log_m not in self._domains:
            plan = get_plan(log_m)
            self._domains[log_m] = powers_device(
                FR, FR.encode_scalar(plan.omega), 1 << log_m
            )
        return self._domains[log_m]

    @staticmethod
    def _log_size(length: int, floor_log: int) -> int:
        """Smallest log2 domain >= max(length, 2^floor_log)."""
        log_m = floor_log
        while (1 << log_m) < length:
            log_m += 1
        return log_m

    # -- core ops --------------------------------------------------------
    def commit(self, coeffs_mont: jnp.ndarray) -> G1:
        """coeffs (n,16) Montgomery -> commitment point (host affine)."""
        if self.mesh is not None:
            return self._commit_mesh(coeffs_mont)
        scalars_std = FR.from_mont(coeffs_mont)
        return msm_to_host(self.srs.g1_powers[: coeffs_mont.shape[0]], scalars_std)

    def commit_many(self, coeffs_list: list) -> list[G1]:
        """Commit k polynomials in ONE device pass (msm_many_to_host).

        A whole commit round (all advice columns, all grand products, all
        quotient chunks) costs one sort + one bucket loop instead of k
        dispatch chains — the dominant prove() cost on high-RTT links."""
        if len(coeffs_list) == 1 or self.mesh is not None:
            # mesh path: each commit is itself point-axis parallel over all
            # devices (bucket exchange); batching across polys would shrink
            # per-device work below the collective-latency floor
            return [self.commit(c) for c in coeffs_list]
        from ..msm.jnp_msm import msm_many_to_host

        m = max(c.shape[0] for c in coeffs_list)

        def padded(c):
            if c.shape[0] == m:
                return c
            return jnp.concatenate(
                [c, jnp.zeros((m - c.shape[0], c.shape[1]), dtype=c.dtype)], axis=0
            )

        stack = jnp.stack([padded(c) for c in coeffs_list])
        return msm_many_to_host(self.srs.g1_powers[:m], FR.from_mont(stack))

    def eval_many(self, jobs: list[tuple[jnp.ndarray, int]]) -> list[int]:
        """Batched polynomial evaluations: [(coeffs, z)] -> [f(z)].

        One stacked power-table dot + one tree reduction + ONE device->host
        sync for the whole batch (vs ~15 dispatches AND a sync per job via
        eval_poly — the single biggest prove() dispatch sink)."""
        if not jobs:
            return []
        m = 1 << self._log_size(max(c.shape[0] for c, _ in jobs), 0)
        zpow_cache: dict[int, jnp.ndarray] = {}
        for _, z in jobs:
            if z not in zpow_cache:
                zpow_cache[z] = powers_device(FR, FR.encode_scalar(z), m)

        def padded(c):
            if c.shape[0] == m:
                return c
            return jnp.concatenate(
                [c, jnp.zeros((m - c.shape[0], c.shape[1]), dtype=c.dtype)], axis=0
            )

        stack = jnp.stack([padded(c) for c, _ in jobs])  # (P, m, 16)
        pows = jnp.stack([zpow_cache[z] for _, z in jobs])
        prod = FR.mul(stack, pows)
        while prod.shape[1] > 1:
            half = prod.shape[1] // 2
            prod = FR.add(prod[:, :half], prod[:, half : 2 * half])
        return FR.decode(prod[:, 0])

    def eval_poly(self, coeffs_mont: jnp.ndarray, z: int) -> int:
        """f(z) via power-table dot + tree reduction (any length <= srs.n)."""
        m = 1 << self._log_size(coeffs_mont.shape[0], 0)
        zpows = powers_device(FR, FR.encode_scalar(z), m)
        prod = FR.mul(coeffs_mont, zpows[: coeffs_mont.shape[0]])
        if prod.shape[0] < m:
            pad = jnp.zeros((m - prod.shape[0], prod.shape[1]), dtype=prod.dtype)
            prod = jnp.concatenate([prod, pad], axis=0)
        return FR.decode_scalar(_tree_sum(FR, prod))

    def quotient(self, coeffs_mont: jnp.ndarray, z: int, y: int) -> jnp.ndarray:
        """(f(X) - y) / (X - z) as (m,16) Montgomery coefficients.

        Works for any degree (domain auto-sized to the next power of two >=
        len(coeffs)).  Requires z outside that evaluation domain (true w.h.p.
        for transcript challenges).
        """
        f = FR
        coeffs = coeffs_mont
        log_m = self._log_size(coeffs.shape[0], self.log_n)
        m = 1 << log_m
        plan = get_plan(log_m)
        if coeffs.shape[0] < m:
            pad = jnp.zeros((m - coeffs.shape[0], coeffs.shape[1]), dtype=coeffs.dtype)
            coeffs = jnp.concatenate([coeffs, pad], axis=0)
        evals = plan.forward(coeffs)
        y_m = f.encode_scalar(y)
        z_m = f.encode_scalar(z)
        denom = f.sub(self._domain(log_m), z_m[None])
        q_evals = f.mul(f.sub(evals, y_m[None]), f.batch_inv(denom))
        return plan.inverse(q_evals)

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
        in the transcript (written by the outer protocol).  Polys may have
        different lengths (blinded polys exceed n coeffs); each point's
        combination pads to the longest member."""
        v = transcript.squeeze_challenge()

        def padded(poly: jnp.ndarray, m: int) -> jnp.ndarray:
            if poly.shape[0] >= m:
                return poly
            pad = jnp.zeros((m - poly.shape[0], poly.shape[1]), dtype=poly.dtype)
            return jnp.concatenate([poly, pad], axis=0)

        quotients = []
        for z, opens in queries:
            # h = sum_i v^i * poly_i  (i = order within this point's list)
            m = max(polys[poly_idx].shape[0] for poly_idx, _ in opens)
            h = None
            vi = 1
            y_comb = 0
            for poly_idx, y in opens:
                term = FR.mul(padded(polys[poly_idx], m), FR.encode_scalar(vi)[None])
                h = term if h is None else FR.add(h, term)
                y_comb = (y_comb + vi * y) % Fr.p
                vi = vi * v % Fr.p
            quotients.append(self.quotient(h, z, y_comb))
        for w in self.commit_many(quotients):
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

    # -- SHPLONK (BDFG20) multiopen ----------------------------------------
    def multiopen_prove_shplonk(
        self,
        transcript: Blake2bWrite,
        polys: list[jnp.ndarray],
        queries: list[tuple[int, list[tuple[int, int]]]],
    ) -> None:
        """Two-point multiopen (module docstring).  y values must already be
        in the transcript."""
        p = Fr.p
        y = transcript.squeeze_challenge()
        v = transcript.squeeze_challenge()
        sets = _rotation_sets(queries)
        t_points: list[int] = []
        for z, _ in queries:
            if z not in t_points:
                t_points.append(z)

        max_len = max(poly.shape[0] for poly in polys)
        # f_agg degree <= (max_len - 1) + |T| - 1; domain must hold it.
        log_m = self._log_size(max_len + len(t_points), self.log_n)
        m = 1 << log_m
        plan = get_plan(log_m)
        dom = self._domain(log_m)

        def padded(poly, length):
            if poly.shape[0] >= length:
                return poly[:length]
            pad = jnp.zeros((length - poly.shape[0], poly.shape[1]), dtype=poly.dtype)
            return jnp.concatenate([poly, pad], axis=0)

        def small_poly_evals(coeffs_host: list[int]) -> jnp.ndarray:
            """Evaluate an ascending small host poly on the whole domain."""
            acc = jnp.broadcast_to(FR.encode_scalar(coeffs_host[-1] % p), dom.shape)
            for c in reversed(coeffs_host[:-1]):
                acc = FR.add(FR.mul(acc, dom), FR.encode_scalar(c % p)[None])
            return acc

        f_agg = None
        q_coeffs_per_set = []
        r_u_coeffs_per_set = []  # host coeffs of r_k, reused for r_k(u)
        vk_pow = 1
        for pts, members in sets:
            # q_k = sum_i y^i f_i (coefficients), r_k = sum_i y^i interp_i
            q_k = None
            yi = 1
            r_k = [0] * len(pts)
            for idx, zy in members:
                term = FR.mul(padded(polys[idx], max_len), FR.encode_scalar(yi)[None])
                q_k = term if q_k is None else FR.add(q_k, term)
                for ci, c in enumerate(_interp_coeffs(zy)):
                    r_k[ci] = (r_k[ci] + yi * c) % p
                yi = yi * y % p
            q_coeffs_per_set.append(q_k)
            r_u_coeffs_per_set.append(r_k)
            q_evals = plan.forward(padded(q_k, m))
            r_evals = small_poly_evals(r_k)
            diff = FR.sub(q_evals, r_evals)
            # Z_{T \ S_k} on the domain
            for z in t_points:
                if z not in pts:
                    diff = FR.mul(diff, FR.sub(dom, FR.encode_scalar(z)[None]))
            term = FR.mul(diff, FR.encode_scalar(vk_pow)[None])
            f_agg = term if f_agg is None else FR.add(f_agg, term)
            vk_pow = vk_pow * v % p

        zt_evals = None
        for z in t_points:
            fac = FR.sub(dom, FR.encode_scalar(z)[None])
            zt_evals = fac if zt_evals is None else FR.mul(zt_evals, fac)
        h_evals = FR.mul(f_agg, FR.batch_inv(zt_evals))
        h_coeffs = plan.inverse(h_evals)[:max_len]
        w_comm = self.commit(h_coeffs)
        transcript.write_point(w_comm)

        u = transcript.squeeze_challenge()
        # L(X) = sum_k v^k Z_{T\S_k}(u) (q_k(X) - r_k(u)) - Z_T(u) h(X)
        l_coeffs = None
        vk_pow = 1
        for (pts, members), q_k, r_k in zip(sets, q_coeffs_per_set, r_u_coeffs_per_set):
            zt_sk_u = 1
            for z in t_points:
                if z not in pts:
                    zt_sk_u = zt_sk_u * (u - z) % p
            scale = vk_pow * zt_sk_u % p
            term = FR.mul(q_k, FR.encode_scalar(scale)[None])
            r_const = scale * _poly_eval_host(r_k, u) % p
            term = jnp.concatenate(
                [FR.sub(term[:1], FR.encode_scalar(r_const)[None]), term[1:]], axis=0
            )
            l_coeffs = term if l_coeffs is None else FR.add(l_coeffs, term)
            vk_pow = vk_pow * v % p
        zt_u = 1
        for z in t_points:
            zt_u = zt_u * (u - z) % p
        l_coeffs = FR.sub(l_coeffs, FR.mul(h_coeffs, FR.encode_scalar(zt_u)[None]))
        w2 = self.commit(self.quotient(l_coeffs, u, 0))
        transcript.write_point(w2)

    def multiopen_verify_shplonk(
        self,
        transcript: Blake2bRead,
        commitments: list[G1],
        queries: list[tuple[int, list[tuple[int, int]]]],
    ) -> bool:
        p = Fr.p
        y = transcript.squeeze_challenge()
        v = transcript.squeeze_challenge()
        sets = _rotation_sets(queries)
        t_points: list[int] = []
        for z, _ in queries:
            if z not in t_points:
                t_points.append(z)
        w_comm = transcript.read_point()
        u = transcript.squeeze_challenge()
        w2 = transcript.read_point()

        l_comm = G1.identity()
        vk_pow = 1
        for pts, members in sets:
            q_comm = G1.identity()
            yi = 1
            r_u = 0
            for idx, zy in members:
                q_comm = q_comm.add(commitments[idx].mul(yi))
                r_u = (r_u + yi * _poly_eval_host(_interp_coeffs(zy), u)) % p
                yi = yi * y % p
            zt_sk_u = 1
            for z in t_points:
                if z not in pts:
                    zt_sk_u = zt_sk_u * (u - z) % p
            scale = vk_pow * zt_sk_u % p
            term = q_comm.add(G1.generator().mul(r_u).neg()).mul(scale)
            l_comm = l_comm.add(term)
            vk_pow = vk_pow * v % p
        zt_u = 1
        for z in t_points:
            zt_u = zt_u * (u - z) % p
        l_comm = l_comm.add(w_comm.mul(zt_u).neg())
        # L(u) = 0:  e([L] + u W', G2) == e(W', [s]G2)
        return pairing_check(
            [(l_comm.add(w2.mul(u)), self.srs.g2), (w2.neg(), self.srs.s_g2)]
        )
