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
