"""Shielder ZK relations over the circuit frontend.

Circuit twins of the reference relations crate (SURVEY.md §2 C14-C18):

- ``CircuitNote``      — relations/src/note.rs: 4-element Poseidon preimage
                         order [zk_id, trapdoor, nullifier, account_hash]
- ``verify_merkle_proof_circuit`` — relations/src/merkle_proof.rs:38-61:
                         per level: selector = is_zero(shape); two selects;
                         2-ary Poseidon; final is_equal + assert_is_const
- ``update_account_circuit``      — relations/src/relations/update_account.rs
- ``build_update_note_circuit``   — relations/src/relations/update_note.rs:
                         public-input order [op_pub..., new_note_hash,
                         merkle_root, old_nullifier] (update_note.rs:119-127)

The generic Account/Operation protocol (relations/src/account.rs,
operation.rs) has no concrete impl in the reference repo; ``ShielderAccount``
is the concrete 2-token deposit/withdraw account modeled on the mocked layer
(mocked_zk/src/account.rs, ops.rs):

- account vector: [token_0, balance_0, token_1, balance_1]
- op_pub vector:  [kind (0 deposit / 1 withdraw), amount, token, user]
- op_priv vector: [user]
- combine: constrain op_pub.user == op_priv.user
- update: per token: eq = is_equal(token_i, op.token);
          delta_i = select(eq, amount, 0);
          new_balance_i = balance_i + delta_i - 2*kind*delta_i
          plus the exactly-one-token-matches check eq_0 + eq_1 == 1.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..circuit import AssignedValue, Context, GateChip, PoseidonGadget
from ..fields.host import Fr

P = Fr.p
TOKENS_NUMBER = 2


def encode_scalar_to_fr(b: bytes) -> int:
    """Map a 32-byte chain scalar (token/user address) into Fr (LE, mod p)."""
    return int.from_bytes(b, "little") % P


def merkle_path_shape(leaf_id: int, depth: int) -> list[int]:
    """shape[i] = 1 iff the running node is the LEFT child at level i.

    Matches the circuit convention (merkle_proof.rs:53-55): shape != 0 =>
    selector = 0 => left = current node — which corresponds to an even node
    index at that level in the contract's heap layout (merkle.rs id^1 walk).
    """
    shape = []
    idx = leaf_id
    for _ in range(depth):
        shape.append(1 if idx % 2 == 0 else 0)
        idx //= 2
    return shape


# ---------------------------------------------------------------------------
# Note
# ---------------------------------------------------------------------------


@dataclass
class CircuitNote:
    zk_id: AssignedValue
    trapdoor: AssignedValue
    nullifier: AssignedValue
    account_hash: AssignedValue

    @staticmethod
    def load(ctx: Context, zk_id: int, trapdoor: int, nullifier: int, account_hash: int):
        return CircuitNote(
            ctx.load_witness(zk_id),
            ctx.load_witness(trapdoor),
            ctx.load_witness(nullifier),
            ctx.load_witness(account_hash),
        )

    def to_vec(self) -> list[AssignedValue]:
        # canonical preimage order, note.rs:33-36
        return [self.zk_id, self.trapdoor, self.nullifier, self.account_hash]


def verify_note_circuit(
    gate: GateChip, poseidon: PoseidonGadget, note: CircuitNote, note_hash: AssignedValue
) -> None:
    """update_note.rs:91-103."""
    inner = poseidon.hash_fix_len_array(note.to_vec())
    eq = gate.is_equal(note_hash, inner)
    gate.assert_is_const(eq, 1)


# ---------------------------------------------------------------------------
# Concrete account + operation
# ---------------------------------------------------------------------------


@dataclass
class ShielderOpPub:
    kind: int  # 0 = deposit, 1 = withdraw
    amount: int
    token: int
    user: int

    def to_vec(self) -> list[int]:
        return [self.kind, self.amount, self.token, self.user]


@dataclass
class ShielderOpPriv:
    user: int

    def to_vec(self) -> list[int]:
        return [self.user]


@dataclass
class ShielderAccount:
    """Native-side concrete account: [(token, balance); 2] as Fr elements."""

    balances: list[tuple[int, int]]

    def to_vec(self) -> list[int]:
        out = []
        for t, b in self.balances:
            out.extend([t, b])
        return out

    def hash(self) -> int:
        from ..hash.poseidon import hash_host

        return hash_host(self.to_vec())

    def update(self, op: ShielderOpPub) -> "ShielderAccount":
        new = []
        matched = False
        for t, b in self.balances:
            if t == op.token and not matched:
                matched = True
                nb = (b + op.amount) % P if op.kind == 0 else (b - op.amount) % P
                new.append((t, nb))
            else:
                new.append((t, b))
        assert matched, "operation token not in account"
        return ShielderAccount(new)


@dataclass
class CircuitAccount:
    cells: list[AssignedValue]  # [token_0, bal_0, token_1, bal_1]

    @staticmethod
    def load(ctx: Context, account: ShielderAccount) -> "CircuitAccount":
        return CircuitAccount([ctx.load_witness(v) for v in account.to_vec()])

    def to_vec(self) -> list[AssignedValue]:
        return list(self.cells)

    def update(self, gate: GateChip, op_cells: list[AssignedValue]) -> "CircuitAccount":
        """In-circuit account update (the CircuitAccount::update extension
        point, account.rs:17-21)."""
        kind, amount, token, _user = op_cells
        eqs = []
        new_cells = []
        for i in range(TOKENS_NUMBER):
            t = self.cells[2 * i]
            b = self.cells[2 * i + 1]
            eq = gate.is_equal(t, token)
            eqs.append(eq)
            delta = gate.select(amount, gate.zero, eq)
            # new_b = b + delta - 2*kind*delta  (deposit adds, withdraw subtracts)
            kd = gate.mul(kind, delta)
            new_b = gate.sub(gate.add(b, delta), gate.add(kd, kd))
            new_cells.extend([t, new_b])
        # exactly one supported token matches
        total = gate.add(eqs[0], eqs[1])
        gate.assert_is_const(total, 1)
        return CircuitAccount(new_cells)


def verify_account_circuit(
    gate: GateChip,
    poseidon: PoseidonGadget,
    account,
    account_hash: AssignedValue,
) -> None:
    """update_account.rs:52-65 (generic over CircuitAccountLike)."""
    inner = poseidon.hash_fix_len_array(account.to_vec())
    eq = gate.is_equal(account_hash, inner)
    gate.assert_is_const(eq, 1)


def update_account_circuit(
    gate: GateChip,
    poseidon: PoseidonGadget,
    old_account_hash: AssignedValue,
    new_account_hash: AssignedValue,
    op_cells: list[AssignedValue],
    old_account,
) -> None:
    """update_account.rs:68-94 — generic over CircuitAccountLike (the
    account.rs:17-21 extension point): any object with update/to_vec."""
    verify_account_circuit(gate, poseidon, old_account, old_account_hash)
    new_account = old_account.update(gate, op_cells)
    verify_account_circuit(gate, poseidon, new_account, new_account_hash)


# ---------------------------------------------------------------------------
# Merkle membership
# ---------------------------------------------------------------------------


@dataclass
class MerkleProofWitness:
    path_shape: list[int]  # 0/1 per level
    path: list[int]  # sibling digests


def verify_merkle_proof_circuit(
    gate: GateChip,
    poseidon: PoseidonGadget,
    proof: "LoadedMerkleProof",
    root: AssignedValue,
    leaf: AssignedValue,
) -> None:
    """merkle_proof.rs:38-61, verbatim semantics."""
    current = leaf
    for shape, sibling in zip(proof.path_shape, proof.path):
        selector = gate.is_zero(shape)
        left = gate.select(sibling, current, selector)
        right = gate.select(current, sibling, selector)
        current = poseidon.hash_fix_len_array([left, right])
    eq = gate.is_equal(current, root)
    gate.assert_is_const(eq, 1)


@dataclass
class LoadedMerkleProof:
    path_shape: list[AssignedValue]
    path: list[AssignedValue]

    @staticmethod
    def load(ctx: Context, w: MerkleProofWitness) -> "LoadedMerkleProof":
        return LoadedMerkleProof(
            [ctx.load_witness(s) for s in w.path_shape],
            [ctx.load_witness(v) for v in w.path],
        )


# ---------------------------------------------------------------------------
# update_note — THE relation (update_note.rs:106-148)
# ---------------------------------------------------------------------------


def _shielder_combine(gate: GateChip, op_priv_cells, op_pub_cells):
    """Operation::combine for the Shielder family (operation.rs combine +
    mocked ops.rs: the private user must equal the public user; kind must be
    a bit).  Returns op_pub as the combined op driving the account update."""
    gate.assert_bit(op_pub_cells[0])
    eq_user = gate.is_equal(op_priv_cells[0], op_pub_cells[3])
    gate.assert_is_const(eq_user, 1)
    return op_pub_cells


def _shielder_model():
    from .protocol import AccountModel

    return AccountModel(load=CircuitAccount.load, circuit_combine=_shielder_combine)


SHIELDER_MODEL = _shielder_model()


def build_update_note_circuit(
    op_pub,
    new_note_hash: int,
    merkle_root: int,
    new_note: tuple[int, int, int, int],
    old_note: tuple[int, int, int, int],
    merkle_proof: MerkleProofWitness,
    op_priv,
    old_account,
    poseidon_gate: bool = True,
    model=None,
) -> Context:
    """Builds the full deposit/withdraw relation circuit with its witness.

    GENERIC over the account family (relations/protocol.AccountModel — the
    account.rs:8-21 / operation.rs:3-23 extension traits): ``model``
    supplies the account load and operation combine; defaults to the
    concrete 2-token SHIELDER_MODEL.  ``op_pub``/``op_priv``/``old_account``
    are whatever the model's family uses (anything with ``to_vec``).

    Returns the populated Context; ctx.publics is the public-input vector in
    the reference's order: [op_pub..., new_note_hash, merkle_root,
    old_nullifier] (update_note.rs:119-127).

    poseidon_gate=True routes the 18 Poseidon permutations through the
    degree-6 custom gate (65 rows each vs ~7.5k flat rows — a 2^12 domain
    instead of 2^18); False keeps the pure flat-gate lowering.
    """
    if model is None:
        model = SHIELDER_MODEL
    ctx = Context(poseidon_gate=poseidon_gate)
    gate = GateChip(ctx)
    poseidon = PoseidonGadget(ctx, gate)

    # Load everything as witnesses (update_note.rs:47-88).
    op_pub_cells = [ctx.load_witness(v) for v in op_pub.to_vec()]
    new_note_hash_c = ctx.load_witness(new_note_hash)
    merkle_root_c = ctx.load_witness(merkle_root)
    new_note_c = CircuitNote.load(ctx, *new_note)
    old_note_c = CircuitNote.load(ctx, *old_note)
    merkle_proof_c = LoadedMerkleProof.load(ctx, merkle_proof)
    op_priv_cells = [ctx.load_witness(v) for v in op_priv.to_vec()]
    old_account_c = model.load(ctx, old_account)

    # Expose publics in the canonical order.
    for c in op_pub_cells:
        ctx.make_public(c)
    ctx.make_public(new_note_hash_c)
    ctx.make_public(merkle_root_c)
    ctx.make_public(old_note_c.nullifier)

    # 1. New note hashes correctly.
    verify_note_circuit(gate, poseidon, new_note_c, new_note_hash_c)

    # 2. Old note hash + merkle membership.
    old_note_hash = poseidon.hash_fix_len_array(old_note_c.to_vec())
    verify_merkle_proof_circuit(gate, poseidon, merkle_proof_c, merkle_root_c, old_note_hash)

    # 3. Combine op_priv with op_pub (Operation::combine, model-specific).
    op_cells = model.circuit_combine(gate, op_priv_cells, op_pub_cells)

    # 4. Account update between the two note account-hashes.
    update_account_circuit(
        gate,
        poseidon,
        old_note_c.account_hash,
        new_note_c.account_hash,
        list(op_cells),
        old_account_c,
    )
    return ctx
