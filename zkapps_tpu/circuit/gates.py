"""GateChip — basic gate library over the flat Context.

Semantic twin of halo2-base's GateChip/GateInstructions for the ops the
reference relations use (merkle_proof.rs:53-60, update_account.rs,
update_note.rs): is_zero, select, is_equal, assert_is_const, plus the
arithmetic building blocks they decompose into.
"""

from __future__ import annotations

from ..fields.host import Fr
from .context import AssignedValue, Context

P = Fr.p


class GateChip:
    def __init__(self, ctx: Context):
        self.ctx = ctx

    # -- constants -------------------------------------------------------
    def const(self, v: int) -> AssignedValue:
        return self.ctx.load_constant(v)

    @property
    def zero(self) -> AssignedValue:
        return self.const(0)

    @property
    def one(self) -> AssignedValue:
        return self.const(1)

    # -- arithmetic ------------------------------------------------------
    def add(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        return self.ctx.raw_gate(a, b, self.one)  # a + b*1

    def sub(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        # out = a - b  emitted as  out + b*1 = a  -> window [out, b, 1, a]
        ctx = self.ctx
        one = self.one  # may allocate the constant cell — must precede `row`
        row = len(ctx.advice)
        out_val = (a.value - b.value) % P
        ctx.advice.extend([out_val, b.value, one.value, a.value])
        ctx.q_a_rows.append(row)
        ctx.copies.append((b.index, row + 1))
        ctx.copies.append((one.index, row + 2))
        ctx.copies.append((a.index, row + 3))
        return AssignedValue(row, out_val)

    def mul(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        return self.ctx.raw_gate(self.zero, a, b)  # 0 + a*b

    def mul_add(self, a: AssignedValue, b: AssignedValue, c: AssignedValue) -> AssignedValue:
        """c + a*b."""
        return self.ctx.raw_gate(c, a, b)

    def mul_const(self, a: AssignedValue, k: int) -> AssignedValue:
        return self.mul(a, self.const(k))

    def add_const(self, a: AssignedValue, k: int) -> AssignedValue:
        return self.add(a, self.const(k))

    def neg(self, a: AssignedValue) -> AssignedValue:
        return self.mul_const(a, P - 1)

    def inner_product(self, xs, ys) -> AssignedValue:
        acc = None
        for x, y in zip(xs, ys):
            acc = self.mul(x, y) if acc is None else self.mul_add(x, y, acc)
        return acc if acc is not None else self.zero

    # -- predicates / selection ------------------------------------------
    def assert_zero(self, a: AssignedValue) -> None:
        self.ctx.constrain_equal(a, self.zero)

    def assert_is_const(self, a: AssignedValue, k: int) -> None:
        self.ctx.constrain_equal(a, self.const(k))

    def assert_equal(self, a: AssignedValue, b: AssignedValue) -> None:
        self.ctx.constrain_equal(a, b)

    def assert_bit(self, a: AssignedValue) -> None:
        t = self.mul(a, self.sub(a, self.one))
        self.assert_zero(t)

    def is_zero(self, a: AssignedValue) -> AssignedValue:
        """out = 1 iff a == 0; witness inv = a^{-1} (or 0), constraints:
        out = 1 - a*inv  and  a*out = 0."""
        inv_val = pow(a.value, P - 2, P) if a.value else 0
        inv = self.ctx.load_witness(inv_val)
        m = self.mul(a, inv)
        out = self.sub(self.one, m)
        self.assert_zero(self.mul(a, out))
        return out

    def is_equal(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        return self.is_zero(self.sub(a, b))

    def select(self, a: AssignedValue, b: AssignedValue, sel: AssignedValue) -> AssignedValue:
        """sel*a + (1-sel)*b = b + sel*(a-b).  sel must be boolean."""
        return self.mul_add(sel, self.sub(a, b), b)

    def not_(self, a: AssignedValue) -> AssignedValue:
        return self.sub(self.one, a)

    def and_(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        return self.mul(a, b)

    def or_(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        return self.sub(self.add(a, b), self.mul(a, b))

    # -- lookups / range checks (halo2-base RangeChip analog) --------------
    def range_check(self, a: AssignedValue, bits: int) -> None:
        """Constrain 0 <= a < 2^bits via a lookup into the [0, 2^bits) table.

        Mirrors halo2-base's RangeChip::range_check capability (SURVEY.md
        §2.2 X3); here a single lookup suffices for any table that fits the
        domain (keygen checks 2^bits <= n - 2)."""
        name = f"range_{bits}"
        self.ctx.add_lookup_table(name, range(1 << bits))
        self.ctx.lookup(name, a)

    def range_check_decomposed(self, a: AssignedValue, bits: int, limb_bits: int) -> None:
        """Range check wide values by limb decomposition: a = sum limb_i 2^(i*l),
        each limb range-checked against the 2^limb_bits table (halo2-base's
        decomposition strategy for values wider than the lookup table)."""
        assert bits % limb_bits == 0
        n_limbs = bits // limb_bits
        v = a.value
        limbs = [(v >> (i * limb_bits)) & ((1 << limb_bits) - 1) for i in range(n_limbs)]
        acc = None
        cells = []
        for lv in limbs:
            cell = self.ctx.load_witness(lv)
            self.range_check(cell, limb_bits)
            cells.append(cell)
        for i, cell in enumerate(reversed(cells)):
            acc = cell if acc is None else self.mul_add(acc, self.const(1 << limb_bits), cell)
        self.assert_equal(acc, a)
