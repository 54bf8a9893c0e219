"""PLONK prover — device-heavy pipeline (SURVEY.md §3.5 stack).

synthesis (host builder) -> advice encode -> COMMIT (MSM) -> permutation
grand product (batched inverse + prefix scan) -> quotient on the 4n coset
(coset NTTs, pointwise constraint evaluation, Z_H division) -> OPEN (KZG
multiopen via GWC).  All hot stages are batched jnp on (n,16) limb arrays;
the transcript and challenge derivation are host-side (blake2b).

Protocol order: publics -> [A] -> beta,gamma -> [Z] -> y -> [h0,h1,h2] -> x
-> evals -> multiopen(v, W_j).
"""

from __future__ import annotations

import os
import sys
import time

import jax.numpy as jnp
import numpy as np

_TIMING = os.environ.get("ZKTPU_TIMING") == "1"


def _mark(label: str, t0: list):
    if _TIMING:
        now = time.time()
        print(f"  prove[{label}] +{now - t0[0]:.1f}s", file=sys.stderr, flush=True)
        t0[0] = now

from ..circuit.context import Context
from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..ntt.jnp_ntt import get_plan
from ..transcript.blake2b import Blake2bWrite
from .keygen import DELTA, PlonkPK

P = Fr.p

# Multiopen query structure: polys opened at x, wx, w2x, w3x.
EVAL_ORDER_X = ["a", "z", "h0", "h1", "q_a", "q_c", "f", "sigma_a", "sigma_pi"]
EVAL_ORDER_WX = ["a", "z"]
EVAL_ORDER_W2X = ["a"]
EVAL_ORDER_W3X = ["a"]


def _prefix_product(vals: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix products along axis 0 (field elements, Montgomery)."""
    import jax

    return jax.lax.associative_scan(FR.mul, vals, axis=0)


def prove(pk: PlonkPK, ctx: Context, debug_checks: bool = False) -> bytes:
    t0 = [time.time()]
    n, log_n = pk.n, pk.log_n
    plan = get_plan(log_n)
    ext_plan = get_plan(log_n + 2)

    publics = [ctx.advice[c] % P for c in ctx.publics]
    assert len(publics) == pk.vk.num_publics

    # -- column vectors ---------------------------------------------------
    a_ints = [v % P for v in ctx.advice] + [0] * (n - ctx.num_rows)
    pi_ints = publics + [0] * (n - len(publics))
    a_vals = FR.encode(a_ints)
    pi_vals = FR.encode(pi_ints)
    a_coeffs = plan.inverse(a_vals)
    pi_coeffs = plan.inverse(pi_vals)

    transcript = Blake2bWrite()
    for v in publics:
        transcript.common_scalar(v)

    _mark("encode+intt", t0)
    a_comm = pk.kzg.commit(a_coeffs)
    transcript.write_point(a_comm)
    _mark("commit A", t0)

    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()
    beta_m = FR.encode_scalar(beta)[None]
    gamma_m = FR.encode_scalar(gamma)[None]

    # -- permutation grand product ---------------------------------------
    def blend(col, labels):
        return FR.add(col, FR.add(FR.mul(beta_m, labels), gamma_m))

    num = FR.mul(blend(a_vals, pk.id_a), blend(pi_vals, pk.id_pi))
    den = FR.mul(blend(a_vals, pk.sigma_a_vals), blend(pi_vals, pk.sigma_pi_vals))
    ratio = FR.mul(num, FR.batch_inv(den))
    prefix = _prefix_product(ratio)
    z_vals = jnp.concatenate([FR.one_mont[None], prefix[:-1]], axis=0)
    if debug_checks:
        total = FR.decode_scalar(prefix[-1])
        assert total == 1, f"grand product does not telescope: {total}"
    _mark("grand product", t0)
    z_coeffs = plan.inverse(z_vals)
    z_comm = pk.kzg.commit(z_coeffs)
    transcript.write_point(z_comm)
    _mark("commit Z", t0)

    y = transcript.squeeze_challenge()
    y_m = FR.encode_scalar(y)[None]

    # -- quotient on the 4n coset ----------------------------------------
    def coset(coeffs):
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((4 * n - coeffs.shape[0], coeffs.shape[1]), dtype=coeffs.dtype)]
        )
        return ext_plan.coset_forward(padded)

    a_x = coset(a_coeffs)
    pi_x = coset(pi_coeffs)
    z_x = coset(z_coeffs)
    q_a_x = coset(pk.coeffs["q_a"])
    q_c_x = coset(pk.coeffs["q_c"])
    f_x = coset(pk.coeffs["f"])
    s_a_x = coset(pk.coeffs["sigma_a"])
    s_pi_x = coset(pk.coeffs["sigma_pi"])

    rot = lambda arr, k: jnp.roll(arr, -4 * k, axis=0)  # noqa: E731  (omega = omega4^4)

    # C0: arithmetic gate
    c0 = FR.mul(q_a_x, FR.sub(FR.add(a_x, FR.mul(rot(a_x, 1), rot(a_x, 2))), rot(a_x, 3)))
    # C1: constants
    c1 = FR.mul(q_c_x, FR.sub(a_x, f_x))
    # C2: permutation
    id_a_cx = pk.x_coset
    id_pi_cx = FR.mul(pk.x_coset, FR.encode_scalar(DELTA)[None])
    lhs = FR.mul(rot(z_x, 1), FR.mul(blend(a_x, s_a_x), blend(pi_x, s_pi_x)))
    rhs = FR.mul(z_x, FR.mul(blend(a_x, id_a_cx), blend(pi_x, id_pi_cx)))
    c2 = FR.sub(lhs, rhs)
    # C3: Z(omega^0) = 1
    c3 = FR.mul(pk.l0_coset, FR.sub(z_x, FR.one_mont[None]))

    combined = c0
    for c in (c1, c2, c3):
        combined = FR.add(FR.mul(combined, y_m), c)
    h_evals = FR.mul(combined, pk.zh_inv_coset)
    h_coeffs = ext_plan.coset_inverse(h_evals)
    _mark("quotient", t0)
    if debug_checks:
        tail = FR.decode(h_coeffs[2 * n :])
        assert all(t == 0 for t in tail), "quotient degree exceeds 2n"
    # Constraint degree <= 3(n-1), so h = quotient/Z_H has degree <= 2n-3:
    # exactly two n-sized chunks.
    h_chunks = [h_coeffs[i * n : (i + 1) * n] for i in range(2)]
    h_comms = [pk.kzg.commit(h) for h in h_chunks]
    _mark("commit H", t0)
    for comm in h_comms:
        transcript.write_point(comm)

    x = transcript.squeeze_challenge()
    omega = pk.vk.omega
    points = {
        "x": x,
        "wx": x * omega % P,
        "w2x": x * omega * omega % P,
        "w3x": x * pow(omega, 3, P) % P,
    }

    polys = {
        "a": a_coeffs,
        "z": z_coeffs,
        "h0": h_chunks[0],
        "h1": h_chunks[1],
        "q_a": pk.coeffs["q_a"],
        "q_c": pk.coeffs["q_c"],
        "f": pk.coeffs["f"],
        "sigma_a": pk.coeffs["sigma_a"],
        "sigma_pi": pk.coeffs["sigma_pi"],
    }

    evals: dict[tuple[str, str], int] = {}
    for name in EVAL_ORDER_X:
        evals[(name, "x")] = pk.kzg.eval_poly(polys[name], points["x"])
    for name in EVAL_ORDER_WX:
        evals[(name, "wx")] = pk.kzg.eval_poly(polys[name], points["wx"])
    for name in EVAL_ORDER_W2X:
        evals[(name, "w2x")] = pk.kzg.eval_poly(polys[name], points["w2x"])
    for name in EVAL_ORDER_W3X:
        evals[(name, "w3x")] = pk.kzg.eval_poly(polys[name], points["w3x"])
    for key in _eval_write_order():
        transcript.write_scalar(evals[key])
    _mark("evals", t0)

    # -- multiopen --------------------------------------------------------
    poly_list = list(polys.values())
    poly_idx = {name: i for i, name in enumerate(polys)}
    queries = _multiopen_queries(points, poly_idx, evals)
    pk.kzg.multiopen_prove(transcript, poly_list, queries)
    _mark("multiopen", t0)
    return transcript.finalize()


def _eval_write_order():
    order = []
    for name in EVAL_ORDER_X:
        order.append((name, "x"))
    for name in EVAL_ORDER_WX:
        order.append((name, "wx"))
    for name in EVAL_ORDER_W2X:
        order.append((name, "w2x"))
    for name in EVAL_ORDER_W3X:
        order.append((name, "w3x"))
    return order


def _multiopen_queries(points, poly_idx, evals):
    return [
        (points["x"], [(poly_idx[name], evals[(name, "x")]) for name in EVAL_ORDER_X]),
        (points["wx"], [(poly_idx[name], evals[(name, "wx")]) for name in EVAL_ORDER_WX]),
        (points["w2x"], [(poly_idx[name], evals[(name, "w2x")]) for name in EVAL_ORDER_W2X]),
        (points["w3x"], [(poly_idx[name], evals[(name, "w3x")]) for name in EVAL_ORDER_W3X]),
    ]
