"""PLONK verifier — host-side (pairings + a handful of field ops).

Replays the transcript, checks the combined constraint identity at the
challenge point, and verifies all openings with one GWC double-pairing.
"""

from __future__ import annotations

from ..curve.host import G1
from ..fields.host import Fr
from ..pcs.kzg import KZG
from ..transcript.blake2b import Blake2bRead
from .keygen import DELTA, PlonkVK
from .prover import (
    EVAL_ORDER_W2X,
    EVAL_ORDER_W3X,
    EVAL_ORDER_WX,
    EVAL_ORDER_X,
    _eval_write_order,
    _multiopen_queries,
)

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

    a_comm = tr.read_point()
    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()
    z_comm = tr.read_point()
    y = tr.squeeze_challenge()
    h_comms = [tr.read_point() for _ in range(2)]
    x = tr.squeeze_challenge()

    evals = {}
    for key in _eval_write_order():
        evals[key] = tr.read_scalar()

    # -- public-input polynomial evaluated at x (Lagrange) ----------------
    xn = pow(x, n, P)
    zh_x = (xn - 1) % P
    if zh_x == 0:
        return False  # challenge landed in the domain; reject
    n_inv = pow(n, P - 2, P)
    pi_x = 0
    wk = 1
    for v in publics:
        # L_k(x) = omega^k (x^n - 1) / (n (x - omega^k))
        lk = wk * zh_x % P * pow(n * (x - wk) % P, P - 2, P) % P
        pi_x = (pi_x + v * lk) % P
        wk = wk * omega % P
    l0_x = zh_x * pow(n * (x - 1) % P, P - 2, P) % P

    e = lambda name, pt="x": evals[(name, pt)]  # noqa: E731

    # -- constraint identity at x ----------------------------------------
    c0 = e("q_a") * ((e("a") + e("a", "wx") * e("a", "w2x") - e("a", "w3x")) % P) % P
    c1 = e("q_c") * ((e("a") - e("f")) % P) % P
    lhs = (
        e("z", "wx")
        * ((e("a") + beta * e("sigma_a") + gamma) % P)
        % P
        * ((pi_x + beta * e("sigma_pi") + gamma) % P)
        % P
    )
    rhs = (
        e("z")
        * ((e("a") + beta * x + gamma) % P)
        % P
        * ((pi_x + beta * DELTA % P * x + gamma) % P)
        % P
    )
    c2 = (lhs - rhs) % P
    c3 = l0_x * ((e("z") - 1) % P) % P

    combined = c0
    for c in (c1, c2, c3):
        combined = (combined * y + c) % P
    h_x = (e("h0") + xn * e("h1")) % P
    if combined != h_x * zh_x % P:
        return False

    # -- openings ---------------------------------------------------------
    commitments = {
        "a": a_comm,
        "z": z_comm,
        "h0": h_comms[0],
        "h1": h_comms[1],
        "q_a": vk.commitments["q_a"],
        "q_c": vk.commitments["q_c"],
        "f": vk.commitments["f"],
        "sigma_a": vk.commitments["sigma_a"],
        "sigma_pi": vk.commitments["sigma_pi"],
    }
    points = {
        "x": x,
        "wx": x * omega % P,
        "w2x": x * omega * omega % P,
        "w3x": x * pow(omega, 3, P) % P,
    }
    poly_idx = {name: i for i, name in enumerate(commitments)}
    queries = _multiopen_queries(points, poly_idx, evals)
    comm_list = list(commitments.values())
    return kzg.multiopen_verify(tr, comm_list, queries)
