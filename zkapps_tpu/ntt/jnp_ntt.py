"""Radix-2 NTT over Fr on TPU — batched iterative butterflies.

TPU-first design: the transform is log2(n) stages of static-shape reshapes +
one batched field mul per stage (n/2 twiddle products), which XLA maps onto
the VPU without gathers except the initial bit-reversal permutation (a single
precomputed take).  Twiddles per stage are static strided views of one
precomputed power table.  All twiddle/constant tables are built on device via
log-depth power doubling, not host loops, so plan construction for 2^22 stays
fast.

Coset support multiplies coefficient k by g^k before the forward transform
(and by g^{-k} after the inverse), which is how the quotient-polynomial
evaluation uses it (SURVEY.md §3.5 NTT/iNTT hot stage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import Fr
from ..fields.jnp_ops import FR, LimbField
from ..fields.limbs import N_LIMBS


def powers_device(f: LimbField, x_mont: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^{n-1}] as (n, 16) Montgomery, via log-depth doubling."""
    out = f.one_mont[None, :]
    cur = x_mont  # x^(len(out))
    while out.shape[0] < n:
        out = jnp.concatenate([out, f.mul(out, cur[None, :])], axis=0)
        cur = f.mul(cur, cur)
    return out[:n]


def bitrev_permutation(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class NTTPlan:
    """Precomputed tables for a fixed 2^log_n transform size."""

    def __init__(self, log_n: int, field: LimbField = FR, coset_gen: int | None = None):
        assert log_n <= Fr.two_adicity
        self.log_n = log_n
        self.n = 1 << log_n
        self.f = field
        p = field.p
        omega = Fr.root_of_unity(log_n)
        omega_inv = pow(omega, p - 2, p)
        self.omega = omega
        # (n/2, 16) forward/inverse twiddle power tables (Montgomery).
        half_n = max(self.n // 2, 1)
        self.tw_fwd = powers_device(field, field.encode_scalar(omega), half_n)
        self.tw_inv = powers_device(field, field.encode_scalar(omega_inv), half_n)
        self.n_inv = field.encode_scalar(pow(self.n, p - 2, p))
        self.bitrev = jnp.asarray(bitrev_permutation(log_n))
        g = coset_gen if coset_gen is not None else Fr.generator
        self.coset_gen = g
        self.coset_pows = powers_device(field, field.encode_scalar(g), self.n)
        self.coset_pows_inv = powers_device(
            field, field.encode_scalar(pow(g, p - 2, p)), self.n
        )

    def _transform(self, a: jnp.ndarray, tw_table: jnp.ndarray) -> jnp.ndarray:
        """Core iterative DIT butterfly network.  a: (n, 16) -> (n, 16)."""
        f = self.f
        n = self.n
        x = jnp.take(a, self.bitrev, axis=0)
        for s in range(self.log_n):
            half = 1 << s
            stride = n // (2 * half)
            tw = tw_table[::stride][:half]  # (half, 16), static slice
            x = x.reshape(n // (2 * half), 2 * half, N_LIMBS)
            u = x[:, :half]
            v = f.mul(x[:, half:], tw[None])
            x = jnp.concatenate([f.add(u, v), f.sub(u, v)], axis=1)
        return x.reshape(n, N_LIMBS)

    def forward(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Coefficients -> evaluations at [omega^0 .. omega^{n-1}]."""
        return self._transform(coeffs, self.tw_fwd)

    def inverse(self, evals: jnp.ndarray) -> jnp.ndarray:
        out = self._transform(evals, self.tw_inv)
        return self.f.mul(out, self.n_inv[None])

    def coset_forward(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluations at [g*omega^i]: scale coeff k by g^k, then NTT."""
        return self.forward(self.f.mul(coeffs, self.coset_pows))

    def coset_inverse(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self.f.mul(self.inverse(evals), self.coset_pows_inv)

    # -- batched jitted entry points --------------------------------------
    #
    # The eager methods above issue ~4 device dispatches per butterfly stage;
    # a 2^14 transform is ~60 dispatches, and the PLONK prover runs ~20+
    # transforms per proof — through a high-RTT device link (this sandbox's
    # tunnelled TPU pays ~10 ms per dispatch) that dominates proving time.
    # These wrappers run a whole (K, n, 16) stack of transforms as ONE
    # compiled program.  Plans are lru_cached singletons, so each jit
    # compiles once per (plan, K).

    def _batched(self, attr: str, single):
        import jax

        cache = self.__dict__.setdefault("_batch_jits", {})
        if attr not in cache:
            cache[attr] = jax.jit(jax.vmap(single))
        return cache[attr]

    def forward_many(self, stack: jnp.ndarray) -> jnp.ndarray:
        """(K, n, 16) coefficient stack -> (K, n, 16) evaluations."""
        return self._batched("fwd", self.forward)(stack)

    def inverse_many(self, stack: jnp.ndarray) -> jnp.ndarray:
        return self._batched("inv", self.inverse)(stack)

    def coset_forward_many(self, stack: jnp.ndarray) -> jnp.ndarray:
        return self._batched("cfwd", self.coset_forward)(stack)

    def coset_inverse_many(self, stack: jnp.ndarray) -> jnp.ndarray:
        return self._batched("cinv", self.coset_inverse)(stack)


@functools.lru_cache(maxsize=32)
def get_plan(log_n: int, coset_gen: int | None = None) -> NTTPlan:
    return NTTPlan(log_n, FR, coset_gen)
