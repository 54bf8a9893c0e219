"""PLONK key generation for the flat-Context constraint system.

Builds the fixed polynomials (selectors, constants, round constants,
permutation sigmas) from a circuit *layout* (the structure of a built
Context — gate rows, constant rows, Poseidon rows, copy constraints, public
positions; witness values are ignored), commits them into the verifying key,
and precomputes the device-side tables the prover's quotient computation
needs (coset x-values, Z_H^{-1}, L_0, L_last).

Column layout (c = column index for permutation labels delta^c * omega^row):
  plain circuits:     [a, instance]
  poseidon circuits:  [a, p0..p4, instance]

Permutation argument follows halo2's convention: cell (col, row) gets the
label delta^col * omega^row with delta = g^(2^two_adicity); copy constraints
become cycles and sigma_col(row) is the label of the next cell in the cycle.
When the Poseidon gate is active the per-row product over 7 columns would
exceed the quotient degree budget, so columns are split into chunks with one
running product z_k each (halo2's permutation_chunk_len mechanism):
chunk constraints are gated by (1 - L_last), chunk k+1 starts at chunk k's
last value (l_0 * (z_{k+1} - z_k(w^{n-1} X))), and the final product is
pinned by L_last * (z_last - 1).  Plain circuits keep the single full-wrap
chunk (no gating; the wraparound row enforces the telescope).

Quotient extension: degree-3 gates fit a 4n coset; the degree-6 Poseidon
identity needs 8n (ext_log = log_n + 3).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..circuit.context import N_POSEIDON_COLS, Context
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
    poseidon: bool = False
    p_num_rows: int = 0
    q_pf_rows: tuple[int, ...] = ()
    q_pp_rows: tuple[int, ...] = ()
    rc_rows: tuple[tuple[int, tuple[int, ...]], ...] = ()
    p_copies: tuple[tuple[tuple[int, int], int], ...] = ()
    # lookup (logUp): ordered (name, table values) and (name, a-cell indices)
    lookup_tables: tuple[tuple[str, tuple[int, ...]], ...] = ()
    lookup_cells: tuple[tuple[str, tuple[int, ...]], ...] = ()

    @staticmethod
    def of(ctx: Context) -> "CircuitLayout":
        names = sorted(ctx.lookup_tables)
        return CircuitLayout(
            num_rows=ctx.num_rows,
            q_a_rows=tuple(ctx.q_a_rows),
            const_rows=tuple(ctx.const_rows),
            copies=tuple(ctx.copies),
            num_publics=len(ctx.publics),
            poseidon=ctx.poseidon_gate and ctx.p_num_rows > 0,
            p_num_rows=ctx.p_num_rows,
            q_pf_rows=tuple(ctx.q_pf_rows),
            q_pp_rows=tuple(ctx.q_pp_rows),
            rc_rows=tuple(ctx.rc_rows),
            p_copies=tuple(ctx.p_copies),
            lookup_tables=tuple((nm, ctx.lookup_tables[nm]) for nm in names),
            lookup_cells=tuple((nm, tuple(ctx.lookup_cells.get(nm, ()))) for nm in names),
        )


@dataclass
class PlonkVK:
    log_n: int
    n: int
    omega: int
    num_publics: int
    commitments: dict[str, G1]  # all fixed polys (selectors, constants, sigmas)
    multiopen: str = "gwc"  # 'gwc' | 'shplonk' (halo2_proofs offers both)
    poseidon: bool = False
    lookups: tuple[str, ...] = ()  # lookup table names (logUp argument)

    @property
    def advice_names(self) -> list[str]:
        """Committed advice columns, in transcript order."""
        names = ["a"]
        if self.poseidon:
            names += [f"p{i}" for i in range(N_POSEIDON_COLS)]
        names += [f"lk_{t}" for t in self.lookups]
        names += [f"m_{t}" for t in self.lookups]
        return names

    @property
    def perm_col_names(self) -> list[str]:
        """Columns participating in the permutation argument (instance is
        appended implicitly as the last column index).  Multiplicity columns
        carry no copy constraints and stay out."""
        names = ["a"]
        if self.poseidon:
            names += [f"p{i}" for i in range(N_POSEIDON_COLS)]
        names += [f"lk_{t}" for t in self.lookups]
        return names

    @property
    def num_cols(self) -> int:
        """Permutation columns: perm advice + instance."""
        return len(self.perm_col_names) + 1

    @property
    def chunks(self) -> list[list[int]]:
        """Permutation column chunks (instance = last column index).

        Wide-budget circuits (poseidon / lookups run on the 8n coset) chunk
        columns in groups of <=5 (gated product degree <= 7); plain circuits
        keep the single full-wrap [a, instance] chunk (degree 3 on 4n)."""
        cols = list(range(self.num_cols))
        if not (self.poseidon or self.lookups):
            return [cols]
        return [cols[i : i + 5] for i in range(0, len(cols), 5)]

    @property
    def ext_log_add(self) -> int:
        return 3 if (self.poseidon or self.lookups) else 2

    @property
    def num_h_chunks(self) -> int:
        # max constraint degree after blinding: plain 3n+7 -> h deg <= 2n+7
        # (3 chunks); poseidon/lookup chunk-0 product 7n+13 -> h <= 6n+13 (7).
        return 7 if (self.poseidon or self.lookups) else 3


@dataclass
class PlonkPK:
    vk: PlonkVK
    kzg: KZG
    log_n: int
    n: int
    # fixed polys, coefficient form, Montgomery, (n, 16)
    coeffs: dict[str, jnp.ndarray]
    # permutation label vectors in evaluation form, Montgomery, (n, 16):
    # ids[c] / sigma_vals[c] per column (advice..., instance)
    ids: list[jnp.ndarray]
    sigma_vals: list[jnp.ndarray]
    # instance copy positions (advice_cell -> instance_row), for witness prep
    public_rows: tuple[int, ...]
    # coset tables (ext*n, 16)
    x_coset: jnp.ndarray
    zh_inv_coset: jnp.ndarray
    l0_coset: jnp.ndarray
    llast_coset: jnp.ndarray
    # lookup tables: (name, padded-to-n host values) for multiplicity counts
    lookup_tables: tuple[tuple[str, tuple[int, ...]], ...] = ()
    # Poseidon MDS (host ints) when the gate is active
    mds: tuple[tuple[int, ...], ...] = ()


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


def keygen(
    ctx: Context,
    srs: SRS | None,
    log_n: int | None = None,
    multiopen: str = "gwc",
    pcs: str = "kzg",
) -> PlonkPK:
    """Build pk/vk from a populated Context (layout only is used).

    pcs selects the commitment scheme: "kzg" (ParamsKZG analog, needs the
    SRS) or "ipa" (transparent Pedersen basis + inner-product argument,
    halo2_proofs poly/ipa analog; srs may be None, multiopen must be "gwc"
    — the IPA layer aggregates per point)."""
    assert multiopen in ("gwc", "shplonk")
    assert pcs in ("kzg", "ipa")
    if pcs == "ipa":
        assert multiopen == "gwc", "IPA multiopen uses per-point GWC aggregation"
    layout = CircuitLayout.of(ctx)
    # rotation margin: 4-row flat gate window; Poseidon row-pair needs +1 and
    # the chunked permutation keeps the last row copy-free.
    min_n = max(layout.num_rows + 4, layout.p_num_rows + 2, layout.num_publics + 2)
    for name, table in layout.lookup_tables:
        min_n = max(min_n, len(table))
    for name, cells in layout.lookup_cells:
        min_n = max(min_n, len(cells) + 2)
    if log_n is None:
        log_n = max(3, (min_n - 1).bit_length())
    n = 1 << log_n
    assert min_n <= n, f"circuit needs {min_n} rows, domain has {n}"
    if pcs == "kzg":
        assert n <= srs.n, "SRS too small for this circuit"

    # -- fixed selector / constant vectors -------------------------------
    fixed: dict[str, np.ndarray] = {
        "q_a": np.zeros(n, dtype=object),
        "q_c": np.zeros(n, dtype=object),
        "f": np.zeros(n, dtype=object),
    }
    for r in layout.q_a_rows:
        fixed["q_a"][r] = 1
    for r, v in layout.const_rows:
        fixed["q_c"][r] = 1
        fixed["f"][r] = v % P
    if layout.poseidon:
        fixed["q_pf"] = np.zeros(n, dtype=object)
        fixed["q_pp"] = np.zeros(n, dtype=object)
        for i in range(N_POSEIDON_COLS):
            fixed[f"rc{i}"] = np.zeros(n, dtype=object)
        for r in layout.q_pf_rows:
            fixed["q_pf"][r] = 1
        for r in layout.q_pp_rows:
            fixed["q_pp"][r] = 1
        for r, rcs in layout.rc_rows:
            for i, c in enumerate(rcs):
                fixed[f"rc{i}"][r] = c % P
    # lookup fixed tables: padded to n by repeating the first entry (padding
    # rows stay valid table members; multiplicities absorb the input padding)
    padded_tables: list[tuple[str, tuple[int, ...]]] = []
    for name, table in layout.lookup_tables:
        padded = tuple(table) + (table[0],) * (n - len(table))
        padded_tables.append((name, padded))
        fixed[f"t_{name}"] = np.array(padded, dtype=object)

    # -- permutation sigmas ----------------------------------------------
    # node id = col * n + row; columns [a, (p0..p4,) lk_*, instance]
    n_pose = N_POSEIDON_COLS if layout.poseidon else 0
    n_lk = len(layout.lookup_tables)
    n_perm_advice = 1 + n_pose + n_lk
    n_cols = n_perm_advice + 1
    inst_col = n_cols - 1
    uf = _UnionFind(n_cols * n)
    for i, j in layout.copies:
        uf.union(i, j)  # col 0 rows
    for (pc, prow), a_idx in layout.p_copies:
        uf.union((1 + pc) * n + prow, a_idx)
    for li, (name, cells) in enumerate(layout.lookup_cells):
        col = 1 + n_pose + li
        for row, a_idx in enumerate(cells):
            uf.union(col * n + row, a_idx)
    for k, cell in enumerate(ctx.publics):
        uf.union(cell, inst_col * n + k)
    cycles: dict[int, list[int]] = {}
    for node in range(n_cols * n):
        cycles.setdefault(uf.find(node), []).append(node)

    omega = Fr.root_of_unity(log_n)
    omega_pows = [1] * n
    for r in range(1, n):
        omega_pows[r] = omega_pows[r - 1] * omega % P
    deltas = [pow(DELTA, c, P) for c in range(n_cols)]

    def label(node: int) -> int:
        col, row = divmod(node, n)
        return omega_pows[row] * deltas[col] % P

    sigma = [0] * (n_cols * n)
    for members in cycles.values():
        m = len(members)
        for idx, node in enumerate(members):
            sigma[node] = label(members[(idx + 1) % m])

    # -- device encodings -------------------------------------------------
    plan = get_plan(log_n)
    enc = lambda xs: FR.encode(list(xs))  # noqa: E731
    coeffs = {name: plan.inverse(enc(vec)) for name, vec in fixed.items()}
    ids = []
    sigma_vals = []
    for c in range(n_cols):
        ids.append(enc([w * deltas[c] % P for w in omega_pows]))
        sigma_vals.append(enc(sigma[c * n : (c + 1) * n]))
        coeffs[f"sigma{c}"] = plan.inverse(sigma_vals[c])

    if pcs == "ipa":
        from ..pcs.ipa import IPACommitter, ipa_setup

        # basis must cover blinded polys (n + #openings + 1 coefficients)
        kzg = IPACommitter(ipa_setup(log_n + 1))
    else:
        kzg = KZG(srs, log_n)
    commitments = {name: kzg.commit(c) for name, c in coeffs.items()}
    vk = PlonkVK(
        log_n=log_n,
        n=n,
        omega=omega,
        num_publics=layout.num_publics,
        commitments=commitments,
        multiopen=multiopen,
        poseidon=layout.poseidon,
        lookups=tuple(name for name, _ in layout.lookup_tables),
    )

    # -- coset tables ------------------------------------------------------
    ext_log = log_n + vk.ext_log_add
    ext_plan = get_plan(ext_log)
    m = 1 << ext_log
    g = ext_plan.coset_gen
    omega_ext = ext_plan.omega
    x_coset = FR.mul(
        powers_device(FR, FR.encode_scalar(omega_ext), m), FR.encode_scalar(g)[None]
    )
    # Z_H(x) = x^n - 1 on the coset: g^n * (omega_ext^n)^i - 1, short cycle.
    i_ext = pow(omega_ext, n, P)
    gn = pow(g, n, P)
    cycle_len = m // n
    zh_ints = [(gn * pow(i_ext, i % cycle_len, P) - 1) % P for i in range(cycle_len)]
    zh_cycle = FR.encode(zh_ints)
    zh_coset = jnp.tile(zh_cycle, (n, 1))
    zh_inv_coset = FR.batch_inv(zh_coset)
    # L_k(x) = omega^k (x^n - 1) / (n (x - omega^k)) on the coset.
    n_m = FR.encode_scalar(n)

    def lagrange_coset(k: int) -> jnp.ndarray:
        wk = omega_pows[k]
        denom = FR.mul(n_m[None], FR.sub(x_coset, FR.encode_scalar(wk)[None]))
        return FR.mul(FR.mul(zh_coset, FR.encode_scalar(wk)[None]), FR.batch_inv(denom))

    l0_coset = lagrange_coset(0)
    llast_coset = lagrange_coset(n - 1)

    mds: tuple = ()
    if layout.poseidon:
        from ..hash.poseidon import poseidon_constants

        _, mds_list = poseidon_constants(P)
        mds = tuple(tuple(row) for row in mds_list)

    return PlonkPK(
        vk=vk,
        kzg=kzg,
        log_n=log_n,
        n=n,
        coeffs=coeffs,
        ids=ids,
        sigma_vals=sigma_vals,
        public_rows=tuple(ctx.publics),
        lookup_tables=tuple(padded_tables),
        x_coset=x_coset,
        zh_inv_coset=zh_inv_coset,
        l0_coset=l0_coset,
        llast_coset=llast_coset,
        mds=mds,
    )
