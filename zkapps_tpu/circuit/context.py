"""Flat circuit builder — the halo2-base Context/GateChip semantic twin.

The reference's relations are written against halo2-base's flat
single-advice-region builder (SURVEY.md §2.2 X3): a growing list of assigned
cells, basic gates expressed as 4-cell windows, copy constraints, and
constants.  This module reproduces those *semantics* (not the architecture)
as a Python witness-builder whose output feeds the PLONK backend
(zkapps_tpu.plonk).

PLONKish shape produced:
  - one advice column ``a`` (the flat cell list, 4 rows per basic gate)
  - fixed columns: ``q_a`` (arithmetic selector), ``q_c`` (constant selector),
    ``f`` (constant values)
  - gate identities:
      q_a(X) * (a(X) + a(wX)*a(w^2 X) - a(w^3 X)) = 0
      q_c(X) * (a(X) - f(X)) = 0
  - copy constraints (cell equalities) -> permutation argument
  - public inputs: copies between advice cells and the instance column

Optionally (``poseidon_gate=True``) five extra advice columns p0..p4 carry
Poseidon T=5 permutation state in a row-pair layout — one full round per row
under a degree-6 custom identity (selectors q_pf/q_pp, fixed round-constant
columns rc0..rc4):

    q_pf(X) * ( p_j(wX) - sum_i MDS[j][i] * (p_i(X) + rc_i(X))^5 ) = 0
    q_pp(X) * ( p_j(wX) - ( MDS[j][0]*(p_0+rc_0)^5
                            + sum_{i>=1} MDS[j][i]*(p_i(X)+rc_i(X)) ) ) = 0

This shrinks one Poseidon permutation from ~7.5k flat-gate rows to 65 rows
(NOTES.md fast-path 4); the reference's halo2-base lowers the same hash to
~300 gate rows per permutation via its own custom region.  Sponge inputs and
outputs cross between the ``a`` column and the p columns through copy
constraints (``p_copies``).

Builder ops mirror halo2-base GateChip's surface used by the reference
relations: add/sub/mul/mul_add/is_zero/is_equal/select/assert_is_const
(merkle_proof.rs:53-60, update_account.rs verify fns).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fields.host import Fr

P = Fr.p

N_POSEIDON_COLS = 5  # T_WIDTH


@dataclass(frozen=True)
class AssignedValue:
    """A cell: index into the advice column plus its witness value."""

    index: int
    value: int


@dataclass
class Context:
    """Flat witness list + constraint bookkeeping."""

    advice: list[int] = field(default_factory=list)
    q_a_rows: list[int] = field(default_factory=list)  # rows where the arith gate fires
    const_rows: list[tuple[int, int]] = field(default_factory=list)  # (row, constant)
    copies: list[tuple[int, int]] = field(default_factory=list)  # equal-cell pairs
    publics: list[int] = field(default_factory=list)  # advice cell idx per public input
    _const_cache: dict[int, int] = field(default_factory=dict)
    # -- Poseidon custom-gate region (used when poseidon_gate=True) --------
    poseidon_gate: bool = False
    p_cols: list[list[int]] = field(default_factory=lambda: [[] for _ in range(N_POSEIDON_COLS)])
    q_pf_rows: list[int] = field(default_factory=list)  # full-round rows
    q_pp_rows: list[int] = field(default_factory=list)  # partial-round rows
    rc_rows: list[tuple[int, tuple[int, ...]]] = field(default_factory=list)  # (row, rc[0..4])
    # (p_col, p_row) <-> a-cell equalities (sponge input/output wiring)
    p_copies: list[tuple[tuple[int, int], int]] = field(default_factory=list)
    # -- lookup argument (logUp) -------------------------------------------
    # The reference's halo2_proofs carries halo2's permuted-column lookup
    # (SURVEY.md §2.2 X2); this builder provides the same capability via the
    # log-derivative formulation (logUp), which is TPU-friendlier: proving
    # needs a multiplicity count + one batched inversion instead of sorting.
    # Each named table gets a fixed column t_<name>, an advice input column
    # lk_<name> (cells copied from `a`), a multiplicity column m_<name>, and
    # a running-sum column zl_<name> with the identity
    #   (zl(wX) - zl(X)) (beta+lk)(beta+t) + m (beta+lk) - (beta+t) = 0.
    lookup_tables: dict[str, tuple[int, ...]] = field(default_factory=dict)
    lookup_cells: dict[str, list[int]] = field(default_factory=dict)

    def add_lookup_table(self, name: str, values) -> None:
        vals = tuple(v % P for v in values)
        assert vals, "empty lookup table"
        if name in self.lookup_tables:
            assert self.lookup_tables[name] == vals, f"table {name} redefined"
            return
        self.lookup_tables[name] = vals
        self.lookup_cells.setdefault(name, [])

    def lookup(self, name: str, x: "AssignedValue") -> None:
        """Constrain x's value to be a member of the named table."""
        assert name in self.lookup_tables, f"unknown lookup table {name}"
        self.lookup_cells[name].append(x.index)

    @property
    def p_num_rows(self) -> int:
        return len(self.p_cols[0])

    def append_p_row(self, values: list[int]) -> int:
        """Append one row of Poseidon state; returns the row index."""
        row = len(self.p_cols[0])
        for c in range(N_POSEIDON_COLS):
            self.p_cols[c].append(values[c] % P)
        return row

    # -- cell allocation -------------------------------------------------
    def load_witness(self, value: int) -> AssignedValue:
        value %= P
        self.advice.append(value)
        return AssignedValue(len(self.advice) - 1, value)

    def load_constant(self, value: int) -> AssignedValue:
        value %= P
        if value in self._const_cache:
            idx = self._const_cache[value]
            return AssignedValue(idx, value)
        cell = self.load_witness(value)
        self.const_rows.append((cell.index, value))
        self._const_cache[value] = cell.index
        return cell

    def constrain_equal(self, x: AssignedValue, y: AssignedValue) -> None:
        assert x.value == y.value, "copy constraint between unequal witnesses"
        self.copies.append((x.index, y.index))

    def make_public(self, x: AssignedValue) -> None:
        self.publics.append(x.index)

    # -- the 4-cell vertical arithmetic gate ------------------------------
    def raw_gate(self, x: AssignedValue, y: AssignedValue, z: AssignedValue) -> AssignedValue:
        """Emit window [x, y, z, out] with out = x + y*z; copies re-link inputs."""
        row = len(self.advice)
        out_val = (x.value + y.value * z.value) % P
        self.advice.extend([x.value, y.value, z.value, out_val])
        self.q_a_rows.append(row)
        self.copies.append((x.index, row))
        self.copies.append((y.index, row + 1))
        self.copies.append((z.index, row + 2))
        return AssignedValue(row + 3, out_val)

    @property
    def num_rows(self) -> int:
        return len(self.advice)
