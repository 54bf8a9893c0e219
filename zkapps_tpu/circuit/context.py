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

Builder ops mirror halo2-base GateChip's surface used by the reference
relations: add/sub/mul/mul_add/is_zero/is_equal/select/assert_is_const
(merkle_proof.rs:53-60, update_account.rs verify fns).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fields.host import Fr

P = Fr.p


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
