"""Batched G1 point arithmetic on TPU: branchless complete addition.

Points are homogeneous projective (X:Y:Z) triples of Fq limb vectors, shape
(..., 3, 16) uint32 in Montgomery form; the identity is (0:1:0).  Addition
uses the Renes-Costello-Batina 2015 complete formulas for j-invariant-0
curves (Algorithm 7 / 9 with a=0, b3=3*b=9): exception-free — the same
instruction sequence handles P+Q, P+P, P+0, 0+Q and P+(-P) — which is exactly
what a SIMD machine wants (no data-dependent branches, SURVEY.md §7 hard
part 3).

Cost: add = 12 mul + 2 small-const mul + 13 add/sub over Fq; double = 7 mul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.jnp_ops import FQ, LimbField
from ..fields.limbs import N_LIMBS
from .host import G1

B3 = 9  # 3*b for y^2 = x^3 + 3


class JnpG1:
    """Namespace of batched G1 projective ops over the Fq limb field."""

    def __init__(self, field: LimbField = FQ):
        self.f = field

    # -- encode / decode -------------------------------------------------
    def encode(self, points: list[G1]) -> jnp.ndarray:
        """Host affine points -> (n, 3, 16) projective Montgomery."""
        xs, ys, zs = [], [], []
        for pt in points:
            if pt.is_identity:
                xs.append(0), ys.append(1), zs.append(0)
            else:
                xs.append(pt.x), ys.append(pt.y), zs.append(1)
        return jnp.stack(
            [self.f.encode(xs), self.f.encode(ys), self.f.encode(zs)], axis=-2
        )

    def decode(self, arr) -> list[G1]:
        """(..., 3, 16) projective Montgomery -> host affine points."""
        arr = np.asarray(arr).reshape(-1, 3, N_LIMBS)
        xs = self.f.decode(arr[:, 0])
        ys = self.f.decode(arr[:, 1])
        zs = self.f.decode(arr[:, 2])
        out = []
        p = self.f.p
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(G1.identity())
            else:
                zinv = pow(z, p - 2, p)
                out.append(G1(x * zinv % p, y * zinv % p))
        return out

    def identity_like(self, shape_prefix) -> jnp.ndarray:
        out = jnp.zeros(tuple(shape_prefix) + (3, N_LIMBS), dtype=jnp.uint32)
        return out.at[..., 1, :].set(
            jnp.broadcast_to(self.f.one_mont, tuple(shape_prefix) + (N_LIMBS,))
        )

    # -- ops -------------------------------------------------------------
    #
    # Compile-time note: the formulas are evaluated in *layers* — all field
    # muls with no mutual dependency are stacked along a fresh leading axis
    # and issued as ONE LimbField.mul call.  This cuts the number of
    # limb-multiplier instantiations per point op from 12-14 to 3 (a ~4x
    # XLA-graph reduction, critical for compile time) and feeds the VPU
    # larger arrays at run time.

    def _mul_layer(self, pairs):
        """[(a,b), ...] -> list of products, via one stacked mul call."""
        f = self.f
        lhs = jnp.stack([a for a, _ in pairs], axis=0)
        rhs = jnp.stack([b for _, b in pairs], axis=0)
        out = f.mul(lhs, rhs)
        return [out[k] for k in range(len(pairs))]

    def _pallas_batch(self, p: jnp.ndarray) -> int:
        from ..fields.jnp_ops import get_backend

        if get_backend() != "pallas":
            return 0
        batch = 1
        for s in p.shape[:-2]:
            batch *= s
        return batch

    def add(self, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """Complete addition (RCB15 Algorithm 7, a=0, b3=9)."""
        f = self.f
        if self._pallas_batch(p) >= 128:
            from ..fields.pallas_ops import padd_pallas_auto

            return padd_pallas_auto(f, p, q)
        X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]

        # layer 1: pairwise coordinate products + the three (a+b)(c+d) forms
        t0, t1, t2, m3, m4, m5 = self._mul_layer(
            [
                (X1, X2),
                (Y1, Y2),
                (Z1, Z2),
                (f.add(X1, Y1), f.add(X2, Y2)),
                (f.add(Y1, Z1), f.add(Y2, Z2)),
                (f.add(X1, Z1), f.add(X2, Z2)),
            ]
        )
        t3 = f.sub(m3, f.add(t0, t1))  # X1 Y2 + X2 Y1
        t4 = f.sub(m4, f.add(t1, t2))  # Y1 Z2 + Y2 Z1
        ty = f.sub(m5, f.add(t0, t2))  # X1 Z2 + X2 Z1
        three_t0 = f.add(f.add(t0, t0), t0)
        b3_t2 = f.mul_small(t2, B3)
        z3t = f.add(t1, b3_t2)
        t1m = f.sub(t1, b3_t2)
        y3t = f.mul_small(ty, B3)

        # layer 2: the six cross products of the assembled terms
        a_x, b_x, a_y, b_y, a_z, b_z = self._mul_layer(
            [
                (t4, y3t),
                (t3, t1m),
                (y3t, three_t0),
                (t1m, z3t),
                (three_t0, t3),
                (z3t, t4),
            ]
        )
        X3 = f.sub(b_x, a_x)
        Y3 = f.add(b_y, a_y)
        Z3 = f.add(b_z, a_z)
        return jnp.stack([X3, Y3, Z3], axis=-2)

    def madd(self, p, qxy, q_neg, valid) -> jnp.ndarray:
        """Masked complete mixed addition: p + (±Q) where Q = (x2, y2) affine.

        RCB15 Algorithm 7 with Z2 = 1 substituted (11 muls; complete in p for
        any non-infinity Q).  q_neg / valid are (…,) bool masks; invalid slots
        keep p.  Callers must mask out identity Q rows via valid=False.
        """
        f = self.f
        flags = (q_neg.astype(jnp.uint32) & 1) | ((~valid).astype(jnp.uint32) << 1)
        if self._pallas_batch(p) >= 128:
            from ..fields.pallas_ops import pmadd_pallas_auto

            return pmadd_pallas_auto(f, p, qxy, flags)
        X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        x2 = qxy[..., 0, :]
        y2 = f.select(q_neg, f.neg(qxy[..., 1, :]), qxy[..., 1, :])

        # layer 1
        t0, t1, m3, m4, m5 = self._mul_layer(
            [
                (X1, x2),
                (Y1, y2),
                (f.add(X1, Y1), f.add(x2, y2)),
                (y2, Z1),
                (x2, Z1),
            ]
        )
        t3 = f.sub(m3, f.add(t0, t1))  # X1 y2 + x2 Y1
        t4 = f.add(m4, Y1)  # Y1 + y2 Z1
        ty = f.add(m5, X1)  # X1 + x2 Z1
        three_t0 = f.add(f.add(t0, t0), t0)
        b3_t2 = f.mul_small(Z1, B3)  # t2 = Z1 Z2 = Z1
        z3t = f.add(t1, b3_t2)
        t1m = f.sub(t1, b3_t2)
        y3t = f.mul_small(ty, B3)

        # layer 2
        a_x, b_x, a_y, b_y, a_z, b_z = self._mul_layer(
            [
                (t4, y3t),
                (t3, t1m),
                (y3t, three_t0),
                (t1m, z3t),
                (three_t0, t3),
                (z3t, t4),
            ]
        )
        out = jnp.stack(
            [f.sub(b_x, a_x), f.add(b_y, a_y), f.add(b_z, a_z)], axis=-2
        )
        return self.select(valid, out, p)

    @staticmethod
    def pack_affine(qxy: jnp.ndarray) -> jnp.ndarray:
        """(…, 2, 16) affine rows -> (…, 16) packed: two 16-bit limbs per u32.

        Split-half order per coordinate: word j = limb[j] | limb[j+8] << 16,
        x in words 0..7, y in words 8..15.  Halves the bytes per gathered row
        in the MSM bucket loop (the gather is the dominant cost there); the
        kernel unpacks with one shift+mask+concat per coordinate.
        """
        h = N_LIMBS // 2
        x, y = qxy[..., 0, :], qxy[..., 1, :]
        px = x[..., :h] | (x[..., h:] << 16)
        py = y[..., :h] | (y[..., h:] << 16)
        return jnp.concatenate([px, py], axis=-1)

    @staticmethod
    def unpack_affine(qpk: jnp.ndarray) -> jnp.ndarray:
        """Inverse of pack_affine: (…, 16) -> (…, 2, 16)."""
        h = N_LIMBS // 2
        mask = jnp.uint32(0xFFFF)
        xw, yw = qpk[..., :h], qpk[..., h:]
        x = jnp.concatenate([xw & mask, xw >> 16], axis=-1)
        y = jnp.concatenate([yw & mask, yw >> 16], axis=-1)
        return jnp.stack([x, y], axis=-2)

    def madd_packed(self, p, qpk, q_neg, valid) -> jnp.ndarray:
        """madd with pack_affine-packed addend rows (the MSM gather format)."""
        if self._pallas_batch(p) >= 128:
            from ..fields.pallas_ops import pmadd_packed_pallas_auto

            flags = (q_neg.astype(jnp.uint32) & 1) | ((~valid).astype(jnp.uint32) << 1)
            return pmadd_packed_pallas_auto(self.f, p, qpk, flags)
        return self.madd(p, self.unpack_affine(qpk), q_neg, valid)

    def madd_slab(self, p, slabs, vmask) -> jnp.ndarray:
        """R chained masked mixed-adds: p + sum of valid rows of ``slabs``.

        slabs (…, R, 16) packed affine rows with digit signs ALREADY applied
        (negated y where the digit was negative); vmask (…,) uint32 with bit
        r set iff row r is a real addend.  On the pallas backend all R adds
        run inside one fused kernel (fields/pallas_ops.pmadd_slab_pallas).
        """
        r = slabs.shape[-2]
        if self._pallas_batch(p) >= 128:
            from ..fields.pallas_ops import pmadd_slab_pallas_auto

            return pmadd_slab_pallas_auto(self.f, p, slabs, vmask)
        acc = p
        no_neg = jnp.zeros(vmask.shape, bool)
        for ri in range(r):
            valid = ((vmask >> ri) & 1) > 0
            acc = self.madd(acc, self.unpack_affine(slabs[..., ri, :]), no_neg, valid)
        return acc

    def double(self, p: jnp.ndarray) -> jnp.ndarray:
        """Complete doubling (RCB15 Algorithm 9, a=0, b3=9)."""
        f = self.f
        if self._pallas_batch(p) >= 128:
            from ..fields.pallas_ops import pdbl_pallas_auto

            return pdbl_pallas_auto(f, p)
        X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        # layer 1
        t0, t1, t2, txy = self._mul_layer([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
        z3 = f.add(t0, t0)
        z3 = f.add(z3, z3)
        z3 = f.add(z3, z3)  # 8 Y^2
        t2 = f.mul_small(t2, B3)
        y3 = f.add(t0, t2)
        t2_3 = f.add(f.add(t2, t2), t2)
        t0 = f.sub(t0, t2_3)
        # layer 2
        X3a, Z3, Y3a, X3b = self._mul_layer([(t2, z3), (t1, z3), (t0, y3), (t0, txy)])
        Y3 = f.add(X3a, Y3a)
        X3 = f.add(X3b, X3b)
        return jnp.stack([X3, Y3, Z3], axis=-2)

    def neg(self, p: jnp.ndarray) -> jnp.ndarray:
        return p.at[..., 1, :].set(self.f.neg(p[..., 1, :]))

    def select(self, cond, p, q):
        """cond ? p : q with cond of batch shape (…,)."""
        return jnp.where(cond[..., None, None], p, q)

    def cneg(self, cond, p):
        """Conditionally negate: cond ? -p : p."""
        return self.select(cond, self.neg(p), p)

    def is_identity(self, p) -> jnp.ndarray:
        return self.f.is_zero(p[..., 2, :])

    def eq(self, p, q) -> jnp.ndarray:
        """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 (and both-identity)."""
        f = self.f
        x_eq = f.eq(f.mul(p[..., 0, :], q[..., 2, :]), f.mul(q[..., 0, :], p[..., 2, :]))
        y_eq = f.eq(f.mul(p[..., 1, :], q[..., 2, :]), f.mul(q[..., 1, :], p[..., 2, :]))
        both_id = self.is_identity(p) & self.is_identity(q)
        return (x_eq & y_eq) | both_id

    def batch_scalar_mul(self, points: jnp.ndarray, scalars_std: jnp.ndarray) -> jnp.ndarray:
        """Batched double-and-add: out[i] = scalars[i] * points[i].

        points (n,3,16) projective Montgomery; scalars (n,16) standard form.
        256 fori iterations of one double + one selected add (branchless).
        """
        n = points.shape[0]
        acc0 = self.identity_like((n,))

        def body(j, acc):
            i = 255 - j  # MSB first
            limb = i // 16
            off = i % 16
            bits = (jnp.take(scalars_std, limb, axis=-1) >> off) & 1
            acc = self.double(acc)
            return self.select(bits > 0, self.add(acc, points), acc)

        return jax.lax.fori_loop(0, 256, body, acc0)

    def to_affine(self, p: jnp.ndarray) -> jnp.ndarray:
        """Batch-normalize (n, 3, 16) -> (n, 2, 16) affine (identity -> (0,0))."""
        f = self.f
        zinv = f.batch_inv(p[..., 2, :])
        x = f.mul(p[..., 0, :], zinv)
        y = f.mul(p[..., 1, :], zinv)
        return jnp.stack([x, y], axis=-2)

    def normalize(self, p: jnp.ndarray) -> jnp.ndarray:
        """Batch-normalize (n, 3, 16) projective -> same shape with Z in {0, 1}.

        The MSM bucket kernel's mixed-add fast path (``madd``) requires
        host-encoded points (affine with Z=1, or identity with Z=0); any
        device-computed points (e.g. SRS powers from ``batch_scalar_mul``)
        must pass through here before being fed to ``msm``.
        """
        f = self.f
        aff = self.to_affine(p)
        inf = f.is_zero(p[..., 2, :])
        one = jnp.broadcast_to(f.encode_scalar(1), p[..., 2, :].shape)
        z = jnp.where(inf[..., None], jnp.zeros_like(one), one)
        return jnp.concatenate([aff, z[..., None, :]], axis=-2)


G1_JNP = JnpG1(FQ)
