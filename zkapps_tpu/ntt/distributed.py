"""Distributed NTT: four-step decomposition with all_to_all transposes.

For n = n1*n2 with the coefficient vector reshaped row-major to (n1, n2) and
rows sharded over D devices, the length-n transform factors into (SURVEY.md
§2.3 "sequence-parallel analog"):

  1. all_to_all transpose -> (n2, n1) row-sharded
  2. local length-n1 NTTs along rows (root omega^{n2})
  3. pointwise twiddle by omega^{j2*k1}
  4. all_to_all transpose -> (n1, n2) row-sharded... actually the second
     butterfly pass needs the OTHER axis local again, so transpose and run
     local length-n2 NTTs (root omega^{n1})

Derivation (j = n2*j1 + j2, k = k1 + n1*k2):
  X[k1 + n1*k2] = NTT_{n2, j2->k2}( omega^{j2*k1} * NTT_{n1, j1->k1}(x[n2*j1 + j2]) )

The output comes back as a (n1, n2) row-sharded matrix M with
X[k1 + n1*k2] = M[k1, k2] — i.e. the flat result in *transposed* order.
``inverse`` reverses the factorization, so forward->pointwise->inverse
round-trips without ever materializing the natural order (exactly how the
quotient-evaluation pipeline consumes it).  Two all_to_alls per transform is
the minimum for a sharded radix decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..fields.host import Fr
from ..fields.jnp_ops import FR
from ..fields.limbs import N_LIMBS
from ..ntt.jnp_ntt import NTTPlan, get_plan, powers_device
from ..parallel.mesh import AXIS


def powers_batched(f, xs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-row power tables: xs (B,16) -> (B, k, 16) with [b,i] = xs[b]^i."""
    out = jnp.broadcast_to(f.one_mont, (xs.shape[0], 1, N_LIMBS))
    cur = xs  # xs^(current length)
    while out.shape[1] < k:
        nxt = f.mul(out, cur[:, None, :])
        out = jnp.concatenate([out, nxt], axis=1)
        cur = f.mul(cur, cur)
    return out[:, :k]


class DistributedNTT:
    """Plans a 2^log_n transform factored as 2^log_n1 x 2^log_n2 over a mesh."""

    def __init__(self, mesh, log_n: int, inverse_scaling: bool = True):
        self.mesh = mesh
        self.d = mesh.size
        self.log_n = log_n
        self.n = 1 << log_n
        self.log_n1 = log_n // 2
        self.log_n2 = log_n - self.log_n1
        self.n1, self.n2 = 1 << self.log_n1, 1 << self.log_n2
        assert self.n1 % self.d == 0 and self.n2 % self.d == 0
        p = Fr.p
        self.omega = Fr.root_of_unity(log_n)
        self.omega_inv = pow(self.omega, p - 2, p)
        self.n_inv = FR.encode_scalar(pow(self.n, p - 2, p))
        # Local sub-plans (roots omega^{n2} and omega^{n1}).
        self.plan1 = get_plan(self.log_n1)
        self.plan2 = get_plan(self.log_n2)
        self.omega_m = FR.encode_scalar(self.omega)
        self.omega_inv_m = FR.encode_scalar(self.omega_inv)
        # jitted transform cache: without it every forward()/inverse() call
        # would wrap a fresh jax.jit and recompile the identical graph
        self._jit_cache: dict[bool, object] = {}

    def _twiddle_rows(self, w_m, row_offset_pows, width):
        """(rows,16) base powers omega^{j2} -> (rows, width, 16) tables."""
        return powers_batched(FR, row_offset_pows, width)

    def forward(self, x_mat: jnp.ndarray) -> jnp.ndarray:
        """x_mat: (n1, n2, 16) row-sharded coefficients (row-major flat order).
        Returns (n1, n2, 16) row-sharded M with X[k1 + n1*k2] = M[k1, k2]."""
        return self._transform(x_mat, inverse=False)

    def inverse(self, m_mat: jnp.ndarray) -> jnp.ndarray:
        """Inverse of ``forward`` (consumes transposed order, returns
        row-major coefficients), including the 1/n scaling."""
        return self._transform(m_mat, inverse=True)

    # -- coset transforms (quotient-stage requirement) ---------------------
    #
    # Same convention as ntt.jnp_ntt.NTTPlan: evaluate on g*H by scaling
    # coefficient j with g^j before the forward pass (and g^{-j} after the
    # inverse).  The scale tables live in the same (n1, n2) row-major layout
    # as the coefficients, so the multiply is purely elementwise and keeps
    # the row sharding (XLA inserts no collectives for it).

    def _coset_tables(self):
        if not hasattr(self, "_coset"):
            g = Fr.generator
            g_inv = pow(g, Fr.p - 2, Fr.p)
            pows = powers_device(FR, FR.encode_scalar(g), self.n)
            ipows = powers_device(FR, FR.encode_scalar(g_inv), self.n)
            self._coset = (
                pows.reshape(self.n1, self.n2, N_LIMBS),
                ipows.reshape(self.n1, self.n2, N_LIMBS),
            )
        return self._coset

    def coset_forward(self, x_mat: jnp.ndarray) -> jnp.ndarray:
        """Forward transform on the coset g*H (transposed output order)."""
        return self.forward(FR.mul(x_mat, self._coset_tables()[0]))

    def coset_inverse(self, m_mat: jnp.ndarray) -> jnp.ndarray:
        """Inverse of ``coset_forward`` (row-major coefficients out)."""
        return FR.mul(self.inverse(m_mat), self._coset_tables()[1])

    def rot_transposed(self, m_mat: jnp.ndarray, r: int) -> jnp.ndarray:
        """The evaluation-domain rotation X'[i] = X[i + r] applied directly
        in the transposed (k1, k2) layout ``forward`` returns.

        With i = k1 + n1*k2: rows shift by r with a carry into the column
        axis where k1 + r wraps past n1 — two cheap rolls (the row roll is a
        ppermute on the sharded axis, the column roll is local) + a static
        row split.  Lets the quotient stage's rot(a, k) run without ever
        materializing the natural order.
        """
        n1 = self.n1
        r = r % self.n
        r2, r1 = divmod(r, n1)  # i + r = (k1 + r1) + n1*(k2 + r2 [+1 on wrap])
        base = jnp.roll(m_mat, -r2, axis=1) if r2 else m_mat
        if r1 == 0:
            return base
        a = jnp.roll(base, -r1, axis=0)
        b = jnp.roll(a, -1, axis=1)
        return jnp.concatenate([a[: n1 - r1], b[n1 - r1 :]], axis=0)

    def _transform(self, x_mat: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        d = self.d
        n1, n2 = self.n1, self.n2
        plan1, plan2 = self.plan1, self.plan2
        w_scalar = self.omega_inv if inverse else self.omega
        p = Fr.p

        def local_ntt(plan: NTTPlan, rows: jnp.ndarray, inv: bool) -> jnp.ndarray:
            f = jax.vmap(plan.inverse if inv else plan.forward)
            return f(rows)

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=P(AXIS),
            out_specs=P(AXIS),
            check_vma=False,
        )
        def run(local):  # local: (n1/d, n2, 16) when forward
            if not inverse:
                # 1) transpose to (n2/d, n1, 16)
                t = _a2a_transpose(local, d)
                # 2) local length-n1 NTT along rows
                t = local_ntt(plan1, t, inv=False)
                # 3) twiddle by omega^{j2*k1}: rows j2 = my block
                idx = jax.lax.axis_index(AXIS)
                row0 = idx * (n2 // d)
                t = FR.mul(t, _row_twiddles(w_scalar, row0, n2 // d, n1))
                # 4) transpose back and local length-n2 NTT
                t = _a2a_transpose(t, d)
                t = local_ntt(plan2, t, inv=False)
                return t
            else:
                # reverse factorization
                t = local_ntt(plan2, local, inv=True)
                t = _a2a_transpose(t, d)
                idx = jax.lax.axis_index(AXIS)
                row0 = idx * (n2 // d)
                t = FR.mul(t, _row_twiddles(w_scalar, row0, n2 // d, n1))
                t = local_ntt(plan1, t, inv=True)
                t = _a2a_transpose(t, d)
                return t

        def _row_twiddles(w, row0, rows, width):
            # (rows, width, 16): [r, k] = w^{(row0 + r) * k}
            base_pows = powers_device(FR, FR.encode_scalar(w), rows)  # w^r
            # row0 is traced (depends on axis_index): w^{row0} via bitwise pow
            shift = _pow_traced(FR.encode_scalar(w), row0)
            row_bases = FR.mul(base_pows, shift[None])  # w^{row0 + r}
            return powers_batched(FR, row_bases, width)

        def _pow_traced(base_m, e):
            """base^e for a traced nonneg int e (< 2^31), via fori over bits."""
            def body(i, state):
                result, cur = state
                bit = (e >> i) & 1
                result = FR.select(jnp.asarray(bit > 0), FR.mul(result, cur), result)
                return (result, FR.mul(cur, cur))

            result, _ = jax.lax.fori_loop(
                0, 31, body, (FR.one_mont, base_m)
            )
            return result

        # No extra 1/n scaling here: the two local plan.inverse passes already
        # contribute 1/n1 * 1/n2 = 1/n.
        if inverse not in self._jit_cache:
            self._jit_cache[inverse] = jax.jit(run)
        return self._jit_cache[inverse](x_mat)


def _a2a_transpose(local: jnp.ndarray, d: int) -> jnp.ndarray:
    """(rows/d_local= R, C, 16) -> transpose of the GLOBAL (R*d, C) matrix,
    returned as (C/d, R*d, 16) local block, via one all_to_all."""
    r_loc, c_tot = local.shape[0], local.shape[1]
    c_loc = c_tot // d
    # split columns into d blocks -> (d, R, C/d, 16)
    blocks = local.reshape(r_loc, d, c_loc, N_LIMBS).transpose(1, 0, 2, 3)
    # exchange: device i sends block j to device j
    swapped = jax.lax.all_to_all(blocks, AXIS, split_axis=0, concat_axis=0, tiled=True)
    # swapped: (d, R, C/d, 16) where block k is from device k (rows k*R..)
    # assemble global columns: transpose to (C/d, d, R, 16) -> (C/d, d*R, 16)
    out = swapped.transpose(2, 0, 1, 3).reshape(c_loc, d * r_loc, N_LIMBS)
    return out
