"""PLONK key generation for the flat-Context constraint system.

Builds the fixed polynomials (selectors, constants, permutation sigmas) from
a circuit *layout* (the structure of a built Context — gate rows, constant
rows, copy constraints, public positions; witness values are ignored), commits
them into the verifying key, and precomputes the device-side tables the
prover's quotient computation needs (coset x-values, Z_H^{-1}, L_0).

Permutation argument follows halo2's convention: cell (col, row) gets the
label delta^col * omega^row with delta = g^(2^two_adicity) (an element outside
the evaluation subgroup, so column labels never collide); copy constraints
become cycles and sigma_col(row) is the label of the next cell in the cycle.
Columns: 0 = advice, 1 = instance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..circuit.context import Context
from ..curve.host import G1
from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..ntt.jnp_ntt import get_plan, powers_device
from ..pcs.kzg import KZG
from ..pcs.srs import SRS

P = Fr.p
DELTA = pow(Fr.generator, 1 << Fr.two_adicity, P)


@dataclass(frozen=True)
class CircuitLayout:
    """Witness-independent structure of a circuit."""

    num_rows: int
    q_a_rows: tuple[int, ...]
    const_rows: tuple[tuple[int, int], ...]
    copies: tuple[tuple[int, int], ...]
    num_publics: int

    @staticmethod
    def of(ctx: Context) -> "CircuitLayout":
        return CircuitLayout(
            num_rows=ctx.num_rows,
            q_a_rows=tuple(ctx.q_a_rows),
            const_rows=tuple(ctx.const_rows),
            copies=tuple(ctx.copies),
            num_publics=len(ctx.publics),
        )


@dataclass
class PlonkVK:
    log_n: int
    n: int
    omega: int
    num_publics: int
    commitments: dict[str, G1]  # q_a, q_c, f, sigma_a, sigma_pi


@dataclass
class PlonkPK:
    vk: PlonkVK
    kzg: KZG
    log_n: int
    n: int
    # fixed polys, coefficient form, Montgomery, (n, 16)
    coeffs: dict[str, jnp.ndarray]
    # permutation label vectors in evaluation form, Montgomery, (n, 16)
    id_a: jnp.ndarray
    id_pi: jnp.ndarray
    sigma_a_vals: jnp.ndarray
    sigma_pi_vals: jnp.ndarray
    # instance copy positions (advice_cell -> instance_row), for witness prep
    public_rows: tuple[int, ...]
    # coset tables (4n, 16)
    x_coset: jnp.ndarray
    zh_inv_coset: jnp.ndarray
    l0_coset: jnp.ndarray


class _UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, x: int, y: int) -> None:
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            self.parent[ry] = rx


def keygen(ctx: Context, srs: SRS, log_n: int | None = None) -> PlonkPK:
    """Build pk/vk from a populated Context (layout only is used)."""
    layout = CircuitLayout.of(ctx)
    min_n = layout.num_rows + 4  # rotation margin for the last gate window
    if log_n is None:
        log_n = max(3, (min_n - 1).bit_length())
    n = 1 << log_n
    assert min_n <= n, f"circuit needs {min_n} rows, domain has {n}"
    assert n <= srs.n, "SRS too small for this circuit"

    # -- fixed selector / constant vectors -------------------------------
    q_a = np.zeros(n, dtype=object)
    q_c = np.zeros(n, dtype=object)
    f_vals = np.zeros(n, dtype=object)
    for r in layout.q_a_rows:
        q_a[r] = 1
    for r, v in layout.const_rows:
        q_c[r] = 1
        f_vals[r] = v % P

    # -- permutation sigmas ----------------------------------------------
    # node ids: advice rows [0, n), instance rows [n, 2n)
    uf = _UnionFind(2 * n)
    for i, j in layout.copies:
        uf.union(i, j)
    for k, cell in enumerate(ctx.publics):
        uf.union(cell, n + k)
    cycles: dict[int, list[int]] = {}
    for node in range(2 * n):
        cycles.setdefault(uf.find(node), []).append(node)

    omega = Fr.root_of_unity(log_n)
    omega_pows = [1] * n
    for r in range(1, n):
        omega_pows[r] = omega_pows[r - 1] * omega % P

    def label(node: int) -> int:
        col, row = divmod(node, n)
        return omega_pows[row] * (DELTA if col else 1) % P

    sigma = [0] * (2 * n)
    for members in cycles.values():
        m = len(members)
        for idx, node in enumerate(members):
            sigma[node] = label(members[(idx + 1) % m])

    id_a_ints = omega_pows
    id_pi_ints = [w * DELTA % P for w in omega_pows]
    sigma_a_ints = sigma[:n]
    sigma_pi_ints = sigma[n:]

    # -- device encodings -------------------------------------------------
    plan = get_plan(log_n)
    enc = lambda xs: FR.encode(list(xs))  # noqa: E731
    q_a_m, q_c_m, f_m = enc(q_a), enc(q_c), enc(f_vals)
    sigma_a_m, sigma_pi_m = enc(sigma_a_ints), enc(sigma_pi_ints)
    coeffs = {
        "q_a": plan.inverse(q_a_m),
        "q_c": plan.inverse(q_c_m),
        "f": plan.inverse(f_m),
        "sigma_a": plan.inverse(sigma_a_m),
        "sigma_pi": plan.inverse(sigma_pi_m),
    }

    kzg = KZG(srs, log_n)
    commitments = {name: kzg.commit(c) for name, c in coeffs.items()}
    vk = PlonkVK(
        log_n=log_n, n=n, omega=omega, num_publics=layout.num_publics, commitments=commitments
    )

    # -- coset tables ------------------------------------------------------
    ext_plan = get_plan(log_n + 2)
    g = ext_plan.coset_gen
    omega4 = ext_plan.omega
    x_coset = FR.mul(
        powers_device(FR, FR.encode_scalar(omega4), 4 * n), FR.encode_scalar(g)[None]
    )
    # Z_H(x) = x^n - 1 on the coset: g^n * (omega4^n)^i - 1, period-4 cycle.
    i4 = pow(omega4, n, P)
    gn = pow(g, n, P)
    zh_ints = [(gn * pow(i4, i % 4, P) - 1) % P for i in range(4)]
    zh_cycle = FR.encode(zh_ints)
    zh_coset = jnp.tile(zh_cycle, (n, 1))
    zh_inv_coset = FR.batch_inv(zh_coset)
    # L_0(x) = (x^n - 1) / (n (x - 1)) on the coset.
    n_m = FR.encode_scalar(n)
    denom = FR.mul(n_m[None], FR.sub(x_coset, FR.one_mont[None]))
    l0_coset = FR.mul(zh_coset, FR.batch_inv(denom))

    return PlonkPK(
        vk=vk,
        kzg=kzg,
        log_n=log_n,
        n=n,
        coeffs=coeffs,
        id_a=enc(id_a_ints),
        id_pi=enc(id_pi_ints),
        sigma_a_vals=sigma_a_m,
        sigma_pi_vals=sigma_pi_m,
        public_rows=tuple(ctx.publics),
        x_coset=x_coset,
        zh_inv_coset=zh_inv_coset,
        l0_coset=l0_coset,
    )
