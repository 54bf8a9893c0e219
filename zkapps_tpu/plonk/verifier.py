"""PLONK verifier — host-side (pairings + a handful of field ops).

Replays the transcript, checks the combined constraint identity at the
challenge point (including the degree-6 Poseidon round identities and the
chunked permutation argument when active — see prover.py), and verifies all
openings with the GWC double pairing or the SHPLONK two-point check.
"""

from __future__ import annotations

from ..circuit.context import N_POSEIDON_COLS
from ..curve.host import G1
from ..fields.host import Fr
from ..pcs.kzg import KZG
from ..transcript.blake2b import Blake2bRead
from .keygen import DELTA, PlonkVK
from .prover import eval_points, multiopen_queries, opening_plan

P = Fr.p


def verify(vk: PlonkVK, kzg: KZG, proof: bytes, publics: list[int]) -> bool:
    try:
        return _verify(vk, kzg, proof, publics)
    except (ValueError, AssertionError):
        return False


def _verify(vk: PlonkVK, kzg: KZG, proof: bytes, publics: list[int]) -> bool:
    assert len(publics) == vk.num_publics
    n, omega = vk.n, vk.omega
    tr = Blake2bRead(proof)
    for v in publics:
        tr.common_scalar(v % P)

    advice_comms = {name: tr.read_point() for name in vk.advice_names}
    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()
    z_comms = [tr.read_point() for _ in vk.chunks]
    zl_comms = {t: tr.read_point() for t in vk.lookups}
    y = tr.squeeze_challenge()
    h_comms = [tr.read_point() for _ in range(vk.num_h_chunks)]
    x = tr.squeeze_challenge()

    evals: dict[tuple[str, str], int] = {}
    for name, pnames in opening_plan(vk):
        for pn in pnames:
            evals[(name, pn)] = tr.read_scalar()

    # -- public-input polynomial evaluated at x (Lagrange) ----------------
    xn = pow(x, n, P)
    zh_x = (xn - 1) % P
    if zh_x == 0:
        return False  # challenge landed in the domain; reject
    pi_x = 0
    wk = 1
    for v in publics:
        # L_k(x) = omega^k (x^n - 1) / (n (x - omega^k))
        lk = wk * zh_x % P * pow(n * (x - wk) % P, P - 2, P) % P
        pi_x = (pi_x + v * lk) % P
        wk = wk * omega % P
    l0_x = zh_x * pow(n * (x - 1) % P, P - 2, P) % P
    w_last = pow(omega, n - 1, P)
    llast_x = w_last * zh_x % P * pow(n * (x - w_last) % P, P - 2, P) % P

    e = lambda name, pt="x": evals[(name, pt)]  # noqa: E731

    def col_eval(c: int) -> int:
        if c == vk.num_cols - 1:
            return pi_x
        return e(vk.advice_names[c])

    # -- constraint identity at x ----------------------------------------
    constraints: list[int] = []
    constraints.append(
        e("q_a") * ((e("a") + e("a", "wx") * e("a", "w2x") - e("a", "w3x")) % P) % P
    )
    constraints.append(e("q_c") * ((e("a") - e("f")) % P) % P)

    if vk.poseidon:
        from ..hash.poseidon import poseidon_constants

        _, mds = poseidon_constants(P)
        t_lin = [(e(f"p{i}") + e(f"rc{i}")) % P for i in range(N_POSEIDON_COLS)]
        t_sb = [pow(t, 5, P) for t in t_lin]
        for j in range(N_POSEIDON_COLS):
            acc = sum(mds[j][i] * t_sb[i] for i in range(N_POSEIDON_COLS)) % P
            constraints.append(e("q_pf") * ((e(f"p{j}", "wx") - acc) % P) % P)
        for j in range(N_POSEIDON_COLS):
            acc = (
                mds[j][0] * t_sb[0]
                + sum(mds[j][i] * t_lin[i] for i in range(1, N_POSEIDON_COLS))
            ) % P
            constraints.append(e("q_pp") * ((e(f"p{j}", "wx") - acc) % P) % P)

    # lookup constraints (logUp; order mirrors the prover)
    for t in vk.lookups:
        b_lk = (e(f"lk_{t}") + beta) % P
        b_t = (e(f"t_{t}") + beta) % P
        diff = (e(f"zl_{t}", "wx") - e(f"zl_{t}")) % P
        constraints.append((diff * b_lk % P * b_t + e(f"m_{t}") * b_lk - b_t) % P)
        constraints.append(l0_x * e(f"zl_{t}") % P)

    single_chunk = len(vk.chunks) == 1
    for k, chunk in enumerate(vk.chunks):
        lhs = e(f"z{k}", "wx")
        rhs = e(f"z{k}")
        for c in chunk:
            cv = col_eval(c)
            lhs = lhs * ((cv + beta * e(f"sigma{c}") + gamma) % P) % P
            rhs = rhs * ((cv + beta * pow(DELTA, c, P) % P * x + gamma) % P) % P
        body = (lhs - rhs) % P
        constraints.append(body if single_chunk else (1 - llast_x) % P * body % P)
    constraints.append(l0_x * ((e("z0") - 1) % P) % P)
    if not single_chunk:
        for k in range(1, len(vk.chunks)):
            constraints.append(l0_x * ((e(f"z{k}") - e(f"z{k-1}", "wlx")) % P) % P)
        constraints.append(llast_x * ((e(f"z{len(vk.chunks)-1}") - 1) % P) % P)

    combined = constraints[0]
    for c in constraints[1:]:
        combined = (combined * y + c) % P
    h_x = 0
    xi = 1
    for i in range(vk.num_h_chunks):
        h_x = (h_x + xi * e(f"h{i}")) % P
        xi = xi * xn % P
    if combined != h_x * zh_x % P:
        return False

    # -- openings ---------------------------------------------------------
    commitments: dict[str, G1] = dict(advice_comms)
    for k, zc in enumerate(z_comms):
        commitments[f"z{k}"] = zc
    for t, zc in zl_comms.items():
        commitments[f"zl_{t}"] = zc
    for i, hc in enumerate(h_comms):
        commitments[f"h{i}"] = hc
    commitments.update(vk.commitments)

    names = [name for name, _ in opening_plan(vk)]
    poly_idx = {name: i for i, name in enumerate(names)}
    comm_list = [commitments[name] for name in names]
    queries = multiopen_queries(vk, x, poly_idx, evals)
    if vk.multiopen == "shplonk":
        ok = kzg.multiopen_verify_shplonk(tr, comm_list, queries)
    else:
        ok = kzg.multiopen_verify(tr, comm_list, queries)
    # halo2_proofs transcripts consume exactly the proof stream: a proof with
    # trailing bytes is malformed (benign-looking malleability otherwise).
    tr.assert_consumed()
    return ok
