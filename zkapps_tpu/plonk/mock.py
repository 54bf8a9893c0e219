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
    if ctx.poseidon_gate and ctx.p_num_rows:
        _check_poseidon_rows(ctx)
    for name, cells in ctx.lookup_cells.items():
        table = set(ctx.lookup_tables[name])
        for i in cells:
            if a[i] % P not in table:
                raise ConstraintFailure(
                    f"lookup failed: cell {i} value not in table {name}"
                )


def _check_poseidon_rows(ctx: Context) -> None:
    from ..hash.poseidon import poseidon_constants

    _, mds = poseidon_constants(P)
    rc_by_row = dict(ctx.rc_rows)
    p = ctx.p_cols
    t_width = len(p)
    for r in ctx.q_pf_rows + ctx.q_pp_rows:
        if r + 1 >= ctx.p_num_rows:
            raise ConstraintFailure(f"poseidon round at row {r} overruns p columns")
        if r not in rc_by_row:
            raise ConstraintFailure(f"poseidon round at row {r} missing round constants")
        full = r in ctx.q_pf_rows
        t = [(p[i][r] + rc_by_row[r][i]) % P for i in range(t_width)]
        sb = [pow(x, 5, P) for x in t] if full else [pow(t[0], 5, P)] + t[1:]
        for j in range(t_width):
            out = sum(mds[j][i] * sb[i] for i in range(t_width)) % P
            if out != p[j][r + 1] % P:
                raise ConstraintFailure(
                    f"poseidon {'full' if full else 'partial'} round failed at row {r}, lane {j}"
                )
    for (pc, prow), a_idx in ctx.p_copies:
        if p[pc][prow] % P != ctx.advice[a_idx] % P:
            raise ConstraintFailure(
                f"p-copy failed: p{pc}[{prow}] != advice[{a_idx}]"
            )
