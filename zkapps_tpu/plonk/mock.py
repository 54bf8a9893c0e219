"""MockProver — direct host-side constraint checking (halo2 MockProver analog).

Checks every emitted constraint of a built Context against its witness:
arithmetic gate windows, constant rows, copy constraints.  Used by circuit
tests to validate relations without running the full prover (SURVEY.md §4:
"add what the reference lacks: circuit tests").
"""

from __future__ import annotations

from ..circuit.context import Context
from ..fields.host import Fr

P = Fr.p


class ConstraintFailure(AssertionError):
    pass


def check_circuit(ctx: Context) -> None:
    a = ctx.advice
    for r in ctx.q_a_rows:
        if r + 3 >= len(a):
            raise ConstraintFailure(f"gate window at row {r} overruns advice column")
        lhs = (a[r] + a[r + 1] * a[r + 2]) % P
        if lhs != a[r + 3] % P:
            raise ConstraintFailure(f"arith gate failed at row {r}: {lhs} != {a[r+3]}")
    for r, v in ctx.const_rows:
        if a[r] % P != v % P:
            raise ConstraintFailure(f"const gate failed at row {r}: {a[r]} != {v}")
    for i, j in ctx.copies:
        if a[i] % P != a[j] % P:
            raise ConstraintFailure(f"copy constraint failed: cell {i} != cell {j}")
