"""PLONK prover — device-heavy pipeline (SURVEY.md §3.5 stack).

synthesis (host builder) -> advice encode -> COMMIT (MSM) -> permutation
grand products (batched inverse + prefix scan) -> quotient on the ext coset
(coset NTTs, pointwise constraint evaluation, Z_H division) -> OPEN (KZG
multiopen via GWC or SHPLONK).  All hot stages are batched jnp on (n,16)
limb arrays; the transcript and challenge derivation are host-side (blake2b).

Protocol order: publics -> [advice cols] -> beta,gamma -> [z chunks] -> y
-> [h chunks] -> x -> evals -> multiopen.

Zero-knowledge: witness-carrying polynomials are blinded with random
multiples of the vanishing polynomial (a la the PLONK paper, sec. 8):
col' = col + Z_H * r (deg r = #openings of that poly).  Domain evaluations
are untouched, so every constraint identity still vanishes on H; only the
coset/quotient degree grows (h spans vk.num_h_chunks n-sized chunks, linked
with boundary blinds u_i so individual chunk openings are uniform subject to
their sum).  The reference's halo2_proofs achieves zk with random trailing
rows instead (unusable-rows scheme); the Z_H form needs no active-row
selectors.

Constraint set (folded by challenge y):
  plain:    G0 (flat arith gate), G1 (constants), R_0 (single-chunk
            permutation, full wrap), L0 (z_0(1) = 1)
  poseidon: + F_0..F_4 / P_0..P_4 (full/partial Poseidon round rows,
            degree 6), chunked permutation R_0, R_1 gated by (1 - L_last),
            chunk link l_0 * (z_1 - z_0(w^{n-1} X)), final L_last*(z_1 - 1)
"""

from __future__ import annotations

import os
import sys
import time

import jax.numpy as jnp

_TIMING = os.environ.get("ZKTPU_TIMING") == "1"

from ..metrics import METRICS as _METRICS


def _mark(label: str, t0: list):
    """Stage boundary: stderr timing line (ZKTPU_TIMING) + structured record
    (metrics.METRICS, emitted as JSON lines under ZKTPU_METRICS)."""
    if _TIMING or _METRICS.enabled:
        now = time.time()
        _METRICS.record(f"prove.{label}", now - t0[0])
        if _TIMING:
            print(f"  prove[{label}] +{now - t0[0]:.1f}s", file=sys.stderr, flush=True)
        t0[0] = now


from ..circuit.context import N_POSEIDON_COLS, Context
from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..ntt.jnp_ntt import get_plan
from ..transcript.blake2b import Blake2bWrite
from .keygen import DELTA, PlonkPK, PlonkVK

P = Fr.p


def opening_plan(vk: PlonkVK) -> list[tuple[str, list[str]]]:
    """[(poly_name, [point_name...])] in transcript order.

    Point names: 'x', 'wx', 'w2x', 'w3x', 'wlx' (= w^{n-1} x, chunk link).
    """
    plan: list[tuple[str, list[str]]] = [("a", ["x", "wx", "w2x", "w3x"])]
    if vk.poseidon:
        for i in range(N_POSEIDON_COLS):
            plan.append((f"p{i}", ["x", "wx"]))
    for t in vk.lookups:
        plan.append((f"lk_{t}", ["x"]))
        plan.append((f"m_{t}", ["x"]))
    n_chunks = len(vk.chunks)
    for k in range(n_chunks):
        pts = ["x", "wx"]
        if n_chunks > 1 and k == 0:
            pts.append("wlx")
        plan.append((f"z{k}", pts))
    for t in vk.lookups:
        plan.append((f"zl_{t}", ["x", "wx"]))
    for i in range(vk.num_h_chunks):
        plan.append((f"h{i}", ["x"]))
    fixed = ["q_a", "q_c", "f"]
    if vk.poseidon:
        fixed += ["q_pf", "q_pp"] + [f"rc{i}" for i in range(N_POSEIDON_COLS)]
    fixed += [f"t_{t}" for t in vk.lookups]
    fixed += [f"sigma{c}" for c in range(vk.num_cols)]
    for name in fixed:
        plan.append((name, ["x"]))
    return plan


def eval_points(vk: PlonkVK, x: int) -> dict[str, int]:
    omega = vk.omega
    pts = {
        "x": x,
        "wx": x * omega % P,
        "w2x": x * omega % P * omega % P,
        "w3x": x * pow(omega, 3, P) % P,
    }
    if len(vk.chunks) > 1:
        pts["wlx"] = x * pow(omega, vk.n - 1, P) % P
    return pts


def multiopen_queries(vk: PlonkVK, x: int, poly_idx: dict[str, int], evals) -> list:
    """Group the opening plan by point for the PCS layer."""
    pts = eval_points(vk, x)
    by_point: dict[str, list] = {}
    point_order: list[str] = []
    for name, pnames in opening_plan(vk):
        for pn in pnames:
            if pn not in by_point:
                by_point[pn] = []
                point_order.append(pn)
            by_point[pn].append((poly_idx[name], evals[(name, pn)]))
    return [(pts[pn], by_point[pn]) for pn in point_order]


def _prefix_product(vals: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix products along axis 0 (field elements, Montgomery)."""
    import jax

    return jax.lax.associative_scan(FR.mul, vals, axis=0)


def _rand_frs(k: int, rng) -> jnp.ndarray:
    """k random Fr elements, Montgomery-encoded (k, 16).

    rng=None draws from the OS CSPRNG; a random.Random gives deterministic
    proofs for tests."""
    if rng is None:
        vals = [int.from_bytes(os.urandom(48), "little") % P for _ in range(k)]
    else:
        vals = [rng.getrandbits(384) % P for _ in range(k)]
    return FR.encode(vals)


def _blind_zh(coeffs: jnp.ndarray, blinds_m: jnp.ndarray) -> jnp.ndarray:
    """coeffs + Z_H * r where r has the given (k,16) Montgomery coefficients.

    Z_H = X^n - 1, so coefficient i loses b_i and coefficient n+i gains b_i;
    the result has n+k coefficients but identical evaluations on H."""
    k = blinds_m.shape[0]
    head = FR.sub(coeffs[:k], blinds_m)
    return jnp.concatenate([head, coeffs[k:], blinds_m], axis=0)


_INTT_JIT_CACHE: dict = {}


def _intt_many(plan, mesh, stack: jnp.ndarray) -> jnp.ndarray:
    """Batched first-round INTTs; with a mesh, polys shard over devices and
    transform locally (the reference's rayon-per-column analog)."""
    if mesh is None:
        return plan.inverse_many(stack)
    import functools

    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    k = stack.shape[0]
    d = mesh.size
    pad = (-k) % d
    if pad:
        stack = jnp.concatenate(
            [stack, jnp.zeros((pad,) + stack.shape[1:], stack.dtype)], axis=0
        )

    key = (id(plan), id(mesh))
    if key not in _INTT_JIT_CACHE:

        @functools.partial(
            shard_map, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS), check_vma=False
        )
        def run(local):
            import jax as _j

            return _j.vmap(plan.inverse)(local)

        _INTT_JIT_CACHE[key] = jax.jit(run)
    return _INTT_JIT_CACHE[key](stack)[:k]


def prove(
    pk: PlonkPK, ctx: Context, debug_checks: bool = False, rng=None, mesh=None
) -> bytes:
    """Produce a proof; with ``mesh`` the heavy stages shard over the device
    mesh: commit MSMs bucket-exchange over the point axis, first-round INTTs
    over the poly axis, and the quotient stage through the four-step
    DistributedNTT (coset transforms + pointwise constraints in the
    transposed layout) — the TPU-native analog of the reference's
    rayon-parallel prover (SURVEY.md §2.2 X7, §2.3)."""
    pk.kzg.set_mesh(mesh)
    try:
        return _prove_impl(pk, ctx, debug_checks, rng, mesh)
    finally:
        pk.kzg.set_mesh(None)


def _prove_impl(pk: PlonkPK, ctx: Context, debug_checks: bool, rng, mesh) -> bytes:
    t0 = [time.time()]
    vk = pk.vk
    n, log_n = pk.n, pk.log_n
    plan = get_plan(log_n)
    ext_log = log_n + vk.ext_log_add
    ext_plan = get_plan(ext_log)
    m_ext = 1 << ext_log

    publics = [ctx.advice[c] % P for c in ctx.publics]
    assert len(publics) == vk.num_publics

    # -- column vectors ---------------------------------------------------
    col_vals: dict[str, jnp.ndarray] = {}
    a_ints = [v % P for v in ctx.advice] + [0] * (n - ctx.num_rows)
    col_vals["a"] = FR.encode(a_ints)
    if vk.poseidon:
        for i in range(N_POSEIDON_COLS):
            pad = [0] * (n - ctx.p_num_rows)
            col_vals[f"p{i}"] = FR.encode([v % P for v in ctx.p_cols[i]] + pad)
    # lookup columns: inputs (padded with the table's first entry) and
    # multiplicities over the padded table (logUp)
    lookup_t_ints: dict[str, tuple[int, ...]] = dict(pk.lookup_tables)
    for t in vk.lookups:
        table = lookup_t_ints[t]
        cells = ctx.lookup_cells.get(t, [])
        inputs = [ctx.advice[i] % P for i in cells]
        inputs += [table[0]] * (n - len(inputs))
        first_row: dict[int, int] = {}
        for r, tv in enumerate(table):
            first_row.setdefault(tv, r)
        m_ints = [0] * n
        for v in inputs:
            r = first_row.get(v)
            assert r is not None, f"lookup input {v} not in table {t}"
            m_ints[r] += 1
        col_vals[f"lk_{t}"] = FR.encode(inputs)
        col_vals[f"m_{t}"] = FR.encode(m_ints)
    pi_ints = publics + [0] * (n - len(publics))
    pi_vals = FR.encode(pi_ints)

    transcript = Blake2bWrite()
    for v in publics:
        transcript.common_scalar(v)

    # blind counts = number of openings + 1.  All first-round INTTs run as
    # ONE batched transform (inverse_many): the eager per-column path costs
    # ~60 dispatches each, which dominates proving on high-RTT device links.
    col_coeffs: dict[str, jnp.ndarray] = {}
    open_counts = {name: len(pts) for name, pts in opening_plan(vk)}
    inv_stack = _intt_many(
        plan, mesh, jnp.stack([col_vals[name] for name in vk.advice_names] + [pi_vals])
    )
    pi_coeffs = inv_stack[-1]  # public: never blinded
    for k, name in enumerate(vk.advice_names):
        blinds = _rand_frs(open_counts[name] + 1, rng)
        col_coeffs[name] = _blind_zh(inv_stack[k], blinds)
    _mark("encode+intt", t0)
    for pt in pk.kzg.commit_many([col_coeffs[name] for name in vk.advice_names]):
        transcript.write_point(pt)
    _mark("commit advice", t0)

    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()
    beta_m = FR.encode_scalar(beta)[None]
    gamma_m = FR.encode_scalar(gamma)[None]

    # -- permutation grand products (per chunk) ----------------------------
    def blend(col, labels):
        return FR.add(col, FR.add(FR.mul(beta_m, labels), gamma_m))

    def col_evals_of(c: int) -> jnp.ndarray:
        if c == vk.num_cols - 1:
            return pi_vals
        return col_vals[vk.advice_names[c]]

    chunk_ratios = []
    for chunk in vk.chunks:
        num = None
        den = None
        for c in chunk:
            ev = col_evals_of(c)
            nterm = blend(ev, pk.ids[c])
            dterm = blend(ev, pk.sigma_vals[c])
            num = nterm if num is None else FR.mul(num, nterm)
            den = dterm if den is None else FR.mul(den, dterm)
        chunk_ratios.append(FR.mul(num, FR.batch_inv(den)))

    single_chunk = len(vk.chunks) == 1
    z_vals_list = []
    if single_chunk:
        prefix = _prefix_product(chunk_ratios[0])
        z_vals_list.append(jnp.concatenate([FR.one_mont[None], prefix[:-1]], axis=0))
        if debug_checks:
            total = FR.decode_scalar(prefix[-1])
            assert total == 1, f"grand product does not telescope: {total}"
    else:
        # chunked: rows 0..n-2 active; z_{k+1}(1) = z_k(w^{n-1})
        start = FR.one_mont[None]
        for ratios in chunk_ratios:
            prefix = FR.mul(_prefix_product(ratios[: n - 1]), start)
            z_vals = jnp.concatenate([start, prefix], axis=0)
            z_vals_list.append(z_vals)
            start = prefix[-1:]
        if debug_checks:
            total = FR.decode_scalar(start[0])
            assert total == 1, f"chunked grand product does not telescope: {total}"
    _mark("grand product", t0)

    # -- lookup running sums (logUp) ---------------------------------------
    # zl_0 = 0, zl_{i+1} = zl_i + 1/(beta+lk_i) - m_i/(beta+t_i); the full
    # wrap forces sum_i [1/(beta+lk_i) - m_i/(beta+t_i)] = 0.
    import jax as _jax

    zl_vals_list = []
    for t in vk.lookups:
        t_vals = FR.encode(list(lookup_t_ints[t]))
        inv_a = FR.batch_inv(FR.add(col_vals[f"lk_{t}"], beta_m))
        inv_t = FR.batch_inv(FR.add(t_vals, beta_m))
        delta = FR.sub(inv_a, FR.mul(col_vals[f"m_{t}"], inv_t))
        csum = _jax.lax.associative_scan(FR.add, delta, axis=0)
        zl_vals = jnp.concatenate([jnp.zeros_like(csum[:1]), csum[:-1]], axis=0)
        if debug_checks:
            total = FR.decode_scalar(csum[-1])
            assert total == 0, f"lookup {t} log-derivative sum != 0: {total}"
        zl_vals_list.append(zl_vals)

    # one batched INTT for all grand-product and lookup running-sum columns;
    # commits keep the transcript order z0..zk, zl_t...
    z_inv_stack = _intt_many(plan, mesh, jnp.stack(z_vals_list + zl_vals_list))
    z_coeffs_list = []
    for k in range(len(z_vals_list)):
        blinds = _rand_frs(open_counts[f"z{k}"] + 1, rng)
        z_coeffs_list.append(_blind_zh(z_inv_stack[k], blinds))
    zl_coeffs: dict[str, jnp.ndarray] = {}
    for j, t in enumerate(vk.lookups):
        blinds = _rand_frs(open_counts[f"zl_{t}"] + 1, rng)
        zl_coeffs[t] = _blind_zh(z_inv_stack[len(z_vals_list) + j], blinds)
    for pt in pk.kzg.commit_many(
        z_coeffs_list + [zl_coeffs[t] for t in vk.lookups]
    ):
        transcript.write_point(pt)
    _mark("commit Z", t0)

    y = transcript.squeeze_challenge()
    y_m = FR.encode_scalar(y)[None]

    # -- quotient on the ext coset -----------------------------------------
    def pad_ext(coeffs):
        return jnp.concatenate(
            [coeffs, jnp.zeros((m_ext - coeffs.shape[0], coeffs.shape[1]), dtype=coeffs.dtype)]
        )

    step = m_ext // n  # omega = omega_ext^step

    # ALL coset extensions in one batched transform (one dispatch instead of
    # ~60 per polynomial; see ntt.jnp_ntt coset_forward_many)
    coset_jobs: list[tuple[str, jnp.ndarray]] = []
    coset_jobs += [(f"col:{name}", col_coeffs[name]) for name in vk.advice_names]
    coset_jobs.append(("pi", pi_coeffs))
    coset_jobs += [(f"z:{k}", zc) for k, zc in enumerate(z_coeffs_list)]
    coset_jobs += [
        (f"fx:{name}", c) for name, c in pk.coeffs.items() if not name.startswith("sigma")
    ]
    coset_jobs += [(f"sig:{c}", pk.coeffs[f"sigma{c}"]) for c in range(vk.num_cols)]
    coset_jobs += [(f"zl:{t}", zl_coeffs[t]) for t in vk.lookups]
    if mesh is None:
        dntt = None

        def rot(arr, k: int):
            return jnp.roll(arr, -step * k, axis=0)

        def to_layout(flat_evals: jnp.ndarray) -> jnp.ndarray:
            return flat_evals

        coset_stack = ext_plan.coset_forward_many(
            jnp.stack([pad_ext(arr) for _, arr in coset_jobs])
        )
        by_key = {key: coset_stack[i] for i, (key, _) in enumerate(coset_jobs)}
    else:
        # four-step distributed coset NTTs; pointwise constraint evaluation
        # runs directly in the transposed (k1, k2) layout (everything is
        # elementwise except rot, which DistributedNTT.rot_transposed maps)
        from ..ntt.distributed import DistributedNTT
        from ..parallel.mesh import shard_leading

        dntt = DistributedNTT(mesh, ext_log)

        def rot(arr, k: int):
            return dntt.rot_transposed(arr, step * k)

        def to_layout(flat_evals: jnp.ndarray) -> jnp.ndarray:
            # natural-order (m,16) evals -> transposed row-sharded (n1,n2,16)
            t = flat_evals.reshape(dntt.n2, dntt.n1, flat_evals.shape[-1])
            return shard_leading(mesh, jnp.transpose(t, (1, 0, 2)))

        by_key = {}
        for key, arr in coset_jobs:
            x_mat = shard_leading(
                mesh, pad_ext(arr).reshape(dntt.n1, dntt.n2, arr.shape[-1])
            )
            by_key[key] = dntt.coset_forward(x_mat)
    col_x = {name: by_key[f"col:{name}"] for name in vk.advice_names}
    pi_x = by_key["pi"]
    z_x = [by_key[f"z:{k}"] for k in range(len(z_coeffs_list))]
    fx = {
        name: by_key[f"fx:{name}"]
        for name in pk.coeffs
        if not name.startswith("sigma")
    }
    sig_x = [by_key[f"sig:{c}"] for c in range(vk.num_cols)]

    l0_c = to_layout(pk.l0_coset)
    llast_c = to_layout(pk.llast_coset)
    xid_c = to_layout(pk.x_coset)
    zh_inv_c = to_layout(pk.zh_inv_coset)

    def col_coset_of(c: int) -> jnp.ndarray:
        if c == vk.num_cols - 1:
            return pi_x
        return col_x[vk.advice_names[c]]

    a_x = col_x["a"]
    constraints = []
    # G0: flat arithmetic gate
    constraints.append(
        FR.mul(fx["q_a"], FR.sub(FR.add(a_x, FR.mul(rot(a_x, 1), rot(a_x, 2))), rot(a_x, 3)))
    )
    # G1: constants
    constraints.append(FR.mul(fx["q_c"], FR.sub(a_x, fx["f"])))

    if vk.poseidon:
        mds = pk.mds
        p_x = [col_x[f"p{i}"] for i in range(N_POSEIDON_COLS)]
        rc_x = [fx[f"rc{i}"] for i in range(N_POSEIDON_COLS)]
        t_lin = [FR.add(p_x[i], rc_x[i]) for i in range(N_POSEIDON_COLS)]
        # x^5 s-box: 3 muls each
        t_sb = []
        for t in t_lin:
            t2 = FR.mul(t, t)
            t4 = FR.mul(t2, t2)
            t_sb.append(FR.mul(t4, t))
        mds_m = [[FR.encode_scalar(mds[j][i])[None] for i in range(5)] for j in range(5)]
        for j in range(N_POSEIDON_COLS):
            # full round: out_j = sum_i M[j][i] * sbox(t_i)
            acc = None
            for i in range(N_POSEIDON_COLS):
                term = FR.mul(mds_m[j][i], t_sb[i])
                acc = term if acc is None else FR.add(acc, term)
            constraints.append(FR.mul(fx["q_pf"], FR.sub(rot(p_x[j], 1), acc)))
        for j in range(N_POSEIDON_COLS):
            # partial round: s-box only on element 0
            acc = FR.mul(mds_m[j][0], t_sb[0])
            for i in range(1, N_POSEIDON_COLS):
                acc = FR.add(acc, FR.mul(mds_m[j][i], t_lin[i]))
            constraints.append(FR.mul(fx["q_pp"], FR.sub(rot(p_x[j], 1), acc)))

    # lookup constraints (logUp):
    #   (zl(wX) - zl(X)) (beta+lk)(beta+t) + m (beta+lk) - (beta+t) = 0
    #   L_0 * zl = 0
    zl_x = {t: by_key[f"zl:{t}"] for t in vk.lookups}
    for t in vk.lookups:
        lk_x = col_x[f"lk_{t}"]
        m_x = col_x[f"m_{t}"]
        t_x = fx[f"t_{t}"]
        b_lk = FR.add(lk_x, beta_m)
        b_t = FR.add(t_x, beta_m)
        diff = FR.sub(rot(zl_x[t], 1), zl_x[t])
        constraints.append(
            FR.add(
                FR.mul(FR.mul(diff, b_lk), b_t),
                FR.sub(FR.mul(m_x, b_lk), b_t),
            )
        )
        constraints.append(FR.mul(l0_c, zl_x[t]))

    # permutation constraints
    delta_pows = [pow(DELTA, c, P) for c in range(vk.num_cols)]

    def id_coset_of(c: int) -> jnp.ndarray:
        return FR.mul(xid_c, FR.encode_scalar(delta_pows[c])[None])

    one_b = FR.one_mont[None]
    if single_chunk:
        lhs = rot(z_x[0], 1)
        rhs = z_x[0]
        for c in vk.chunks[0]:
            ev = col_coset_of(c)
            lhs = FR.mul(lhs, blend(ev, sig_x[c]))
            rhs = FR.mul(rhs, blend(ev, id_coset_of(c)))
        constraints.append(FR.sub(lhs, rhs))
        constraints.append(FR.mul(l0_c, FR.sub(z_x[0], one_b)))
    else:
        one_minus_llast = FR.sub(one_b, llast_c)
        for k, chunk in enumerate(vk.chunks):
            lhs = rot(z_x[k], 1)
            rhs = z_x[k]
            for c in chunk:
                ev = col_coset_of(c)
                lhs = FR.mul(lhs, blend(ev, sig_x[c]))
                rhs = FR.mul(rhs, blend(ev, id_coset_of(c)))
            constraints.append(FR.mul(one_minus_llast, FR.sub(lhs, rhs)))
        constraints.append(FR.mul(pk.l0_coset, FR.sub(z_x[0], one_b)))
        # chunk link: z_{k+1}(1) = z_k(w^{n-1})
        for k in range(1, len(vk.chunks)):
            constraints.append(
                FR.mul(l0_c, FR.sub(z_x[k], rot(z_x[k - 1], n - 1)))
            )
        constraints.append(FR.mul(llast_c, FR.sub(z_x[-1], one_b)))

    combined = constraints[0]
    for c in constraints[1:]:
        combined = FR.add(FR.mul(combined, y_m), c)
    h_evals = FR.mul(combined, zh_inv_c)
    if mesh is None:
        h_coeffs = ext_plan.coset_inverse_many(h_evals[None])[0]
    else:
        h_coeffs = dntt.coset_inverse(h_evals).reshape(m_ext, -1)
    _mark("quotient", t0)
    n_h = vk.num_h_chunks
    if debug_checks:
        tail = FR.decode(h_coeffs[n_h * n :])
        assert all(t == 0 for t in tail), f"quotient degree exceeds {n_h}n"
    # Boundary blinds u_i keep the individual chunk openings uniform subject
    # to h(x) = sum x^{in} h_i(x):
    #   h0' = h0 + u0 X^n,  h_i' = h_i - u_{i-1} + u_i X^n,  last: - u_{last}
    raw = [h_coeffs[i * n : (i + 1) * n] for i in range(n_h)]
    u = _rand_frs(n_h - 1, rng)
    h_chunks = []
    for i in range(n_h):
        chunk = raw[i]
        if i > 0:
            chunk = jnp.concatenate([FR.sub(chunk[:1], u[i - 1 : i]), chunk[1:]], axis=0)
        if i < n_h - 1:
            chunk = jnp.concatenate([chunk, u[i : i + 1]], axis=0)
        h_chunks.append(chunk)
    for pt in pk.kzg.commit_many(h_chunks):
        transcript.write_point(pt)
    _mark("commit H", t0)

    x = transcript.squeeze_challenge()
    pts = eval_points(vk, x)

    polys: dict[str, jnp.ndarray] = {}
    for name in vk.advice_names:
        polys[name] = col_coeffs[name]
    for k, zc in enumerate(z_coeffs_list):
        polys[f"z{k}"] = zc
    for t in vk.lookups:
        polys[f"zl_{t}"] = zl_coeffs[t]
    for i, h in enumerate(h_chunks):
        polys[f"h{i}"] = h
    for name, c in pk.coeffs.items():
        polys[name] = c

    jobs, keys = [], []
    for name, pnames in opening_plan(vk):
        for pn in pnames:
            jobs.append((polys[name], pts[pn]))
            keys.append((name, pn))
    vals = pk.kzg.eval_many(jobs)  # one fused dot+reduce, ONE host sync
    evals: dict[tuple[str, str], int] = {}
    for (name, pn), v in zip(keys, vals):
        evals[(name, pn)] = v
        transcript.write_scalar(v)
    _mark("evals", t0)

    # -- multiopen --------------------------------------------------------
    names = [name for name, _ in opening_plan(vk)]
    poly_list = [polys[name] for name in names]
    poly_idx = {name: i for i, name in enumerate(names)}
    queries = multiopen_queries(vk, x, poly_idx, evals)
    if vk.multiopen == "shplonk":
        pk.kzg.multiopen_prove_shplonk(transcript, poly_list, queries)
    else:
        pk.kzg.multiopen_prove(transcript, poly_list, queries)
    _mark("multiopen", t0)
    return transcript.finalize()
