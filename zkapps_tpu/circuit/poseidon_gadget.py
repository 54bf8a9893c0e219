"""In-circuit Poseidon hasher — twin of halo2-base's PoseidonHasher.

Implements ``hash_fix_len_array`` (used by the reference relations at
merkle_proof.rs:56, update_note.rs:100,131, update_account.rs) as gate
sequences over the flat Context, with identical sponge semantics to the
native :mod:`zkapps_tpu.hash.poseidon` (capacity tag 2^64, padding marker 1),
so in-circuit digests equal native digests — the property the reference gets
from pse-poseidon cross-checks.
"""

from __future__ import annotations

from ..fields.host import Fr
from ..hash.poseidon import CAPACITY_TAG, PADDING, R_F, R_P, RATE, T_WIDTH, poseidon_constants
from .context import AssignedValue, Context
from .gates import GateChip

P = Fr.p


class PoseidonGadget:
    def __init__(self, ctx: Context, gate: GateChip):
        self.ctx = ctx
        self.gate = gate
        self.rc, self.mds = poseidon_constants(P)

    # -- permutation -----------------------------------------------------
    def _sbox(self, x: AssignedValue) -> AssignedValue:
        g = self.gate
        x2 = g.mul(x, x)
        x4 = g.mul(x2, x2)
        return g.mul(x4, x)

    def _mix(self, state: list[AssignedValue]) -> list[AssignedValue]:
        g = self.gate
        out = []
        for i in range(T_WIDTH):
            acc = None
            for j in range(T_WIDTH):
                m = g.const(self.mds[i][j])
                acc = g.mul(m, state[j]) if acc is None else g.mul_add(m, state[j], acc)
            out.append(acc)
        return out

    def permute(self, state: list[AssignedValue]) -> list[AssignedValue]:
        if self.ctx.poseidon_gate:
            return self._permute_gate(state)
        return self._permute_flat(state)

    def _permute_flat(self, state: list[AssignedValue]) -> list[AssignedValue]:
        g = self.gate
        r_f_half = R_F // 2
        rnd = 0
        s = list(state)
        for _ in range(r_f_half):
            s = [g.add_const(x, c) for x, c in zip(s, self.rc[rnd])]
            s = [self._sbox(x) for x in s]
            s = self._mix(s)
            rnd += 1
        for _ in range(R_P):
            s = [g.add_const(x, c) for x, c in zip(s, self.rc[rnd])]
            s[0] = self._sbox(s[0])
            s = self._mix(s)
            rnd += 1
        for _ in range(r_f_half):
            s = [g.add_const(x, c) for x, c in zip(s, self.rc[rnd])]
            s = [self._sbox(x) for x in s]
            s = self._mix(s)
            rnd += 1
        return s

    def _permute_gate(self, state: list[AssignedValue]) -> list[AssignedValue]:
        """Custom-gate path: 65 rows in the p columns (context.py docstring).

        Row k holds the state entering round k; the degree-6 row identity
        carries it to row k+1.  Inputs/outputs cross to the flat column via
        p_copies."""
        ctx = self.ctx
        r_f_half = R_F // 2
        n_rounds = R_F + R_P
        vals = [s.value % P for s in state]
        row0 = ctx.append_p_row(vals)
        for i, cell in enumerate(state):
            ctx.p_copies.append(((i, row0), cell.index))
        for rnd in range(n_rounds):
            row = row0 + rnd
            is_full = rnd < r_f_half or rnd >= r_f_half + R_P
            (ctx.q_pf_rows if is_full else ctx.q_pp_rows).append(row)
            ctx.rc_rows.append((row, tuple(self.rc[rnd])))
            # native round (same math as hash.poseidon host reference)
            t = [(v + c) % P for v, c in zip(vals, self.rc[rnd])]
            if is_full:
                t = [pow(x, 5, P) for x in t]
            else:
                t[0] = pow(t[0], 5, P)
            vals = [sum(self.mds[j][i] * t[i] for i in range(T_WIDTH)) % P for j in range(T_WIDTH)]
            ctx.append_p_row(vals)
        out_row = row0 + n_rounds
        outs = []
        for i, v in enumerate(vals):
            cell = ctx.load_witness(v)
            ctx.p_copies.append(((i, out_row), cell.index))
            outs.append(cell)
        return outs

    # -- fixed-length sponge (pse-poseidon semantics) ---------------------
    def hash_fix_len_array(self, inputs: list[AssignedValue]) -> AssignedValue:
        g = self.gate
        state = [g.const(CAPACITY_TAG % P)] + [g.zero] * (T_WIDTH - 1)
        buf = list(inputs)
        while len(buf) >= RATE:
            chunk, buf = buf[:RATE], buf[RATE:]
            for k in range(RATE):
                state[1 + k] = g.add(state[1 + k], chunk[k])
            state = self.permute(state)
        last_chunk = buf + [g.const(PADDING)]
        for k, e in enumerate(last_chunk):
            state[1 + k] = g.add(state[1 + k], e)
        state = self.permute(state)
        return state[1]
