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

    # -- xyzz coordinates (MSM bucket-accumulation fast path) --------------
    #
    # (X, Y, ZZ, ZZZ) with x = X/ZZ, y = Y/ZZZ and ZZ^3 == ZZZ^2; identity is
    # the all-zero tuple.  Mixed addition (madd-2008-s, Z2 = 1) costs 10 muls
    # + ~7 modular adds vs the complete RCB15 madd's 11 muls + ~25 adds, but
    # is INCOMPLETE: P == Q (doubling) is detected and reported as a poison
    # flag rather than computed; callers re-run with the complete kernel when
    # any poison fires (negligible probability for distinct input points —
    # a bucket's partial sum must coincide with its next addend).

    def identity_xyzz_like(self, shape_prefix) -> jnp.ndarray:
        return jnp.zeros(tuple(shape_prefix) + (4, N_LIMBS), dtype=jnp.uint32)

    def madd_xyzz(self, acc, qxy, valid, pflags):
        """Masked xyzz mixed add: acc + Q for valid lanes; exact for fresh
        accumulators and cancellation; equal-point lanes keep acc and set
        their poison flag.  Returns (acc', pflags')."""
        f = self.f
        X1, Y1, ZZ1, ZZZ1 = (acc[..., i, :] for i in range(4))
        x2, y2 = qxy[..., 0, :], qxy[..., 1, :]
        inf1 = f.is_zero(ZZ1)
        U2, S2 = self._mul_layer([(x2, ZZ1), (y2, ZZZ1)])
        Pd = f.sub(U2, X1)
        Rr = f.sub(S2, Y1)
        pz = f.is_zero(Pd)
        rz = f.is_zero(Rr)
        PP, R2 = self._mul_layer([(Pd, Pd), (Rr, Rr)])
        PPP, Q = self._mul_layer([(Pd, PP), (X1, PP)])
        X3 = f.sub(f.sub(R2, PPP), f.add(Q, Q))
        t, yp = self._mul_layer([(Rr, f.sub(Q, X3)), (Y1, PPP)])
        Y3 = f.sub(t, yp)
        ZZ3, ZZZ3 = self._mul_layer([(ZZ1, PP), (ZZZ1, PPP)])

        fresh = inf1 & valid
        cancel = (~inf1) & valid & pz & (~rz)
        poison = (~inf1) & valid & pz & rz
        normal = (~inf1) & valid & (~pz)

        one = jnp.broadcast_to(f.one_mont, X1.shape)
        zero = jnp.zeros_like(X1)

        def pick(n_, f_, c_, keep):
            m = lambda cond, a, b: jnp.where(cond[..., None], a, b)  # noqa: E731
            return m(normal, n_, m(fresh, f_, m(cancel, c_, keep)))

        out = jnp.stack(
            [
                pick(X3, x2, zero, X1),
                pick(Y3, y2, zero, Y1),
                pick(ZZ3, one, zero, ZZ1),
                pick(ZZZ3, one, zero, ZZZ1),
            ],
            axis=-2,
        )
        return out, pflags | poison.astype(jnp.uint32)

    def madd_slab_xyzz(self, acc, slabs, vmask, pflags):
        """R chained masked xyzz mixed-adds (slab layout of madd_slab).

        acc (…, 4, 16) xyzz; slabs (…, R, 16) packed affine, signs
        pre-applied; vmask (…,) uint32 valid bits; pflags (…,) uint32 sticky
        poison.  Returns (acc', pflags')."""
        r = slabs.shape[-2]
        if self._pallas_batch(acc) >= 128:
            from ..fields.pallas_ops import pxyzz_slab_pallas_auto

            return pxyzz_slab_pallas_auto(self.f, acc, slabs, vmask, pflags)
        for ri in range(r):
            valid = ((vmask >> ri) & 1) > 0
            acc, pflags = self.madd_xyzz(
                acc, self.unpack_affine(slabs[..., ri, :]), valid, pflags
            )
        return acc, pflags

    # -- batch-affine accumulators (MSM cheapest bucket path) --------------
    #
    # State per lane: affine (x, y) + an occupancy bit (affine coordinates
    # cannot represent the identity) + a sticky poison bit.  A masked mixed
    # add is lambda = (y2-y1)/(x2-x1) etc. — 3 muls + an amortized ~3-mul
    # share of a per-step Montgomery-trick batch inversion, vs the xyzz
    # kernel's 10 muls.  Same incompleteness contract as xyzz: P == Q is
    # detected and poison-flagged (callers re-run with the complete kernel),
    # P == -Q cancels (lane goes empty), empty lanes assign.

    def affine_identity_like(self, shape_prefix):
        """Empty batch-affine accumulator state: (ax, ay, occ, pflags)."""
        shape = tuple(shape_prefix)
        z = jnp.zeros(shape + (N_LIMBS,), jnp.uint32)
        b = jnp.zeros(shape, jnp.uint32)
        return z, z, b, b

    def affine_step(self, ax, ay, occ, rows, valid, pflags):
        """One masked batch-affine accumulation step over all lanes.

        ax/ay (w,16) accumulator coordinates; occ (w,) uint32 occupancy;
        rows (w,16) pack_affine-packed addends with digit signs pre-applied;
        valid (w,) bool; pflags (w,) uint32 sticky poison.  Returns updated
        (ax, ay, occ, pflags).  On the pallas backend the step runs as the
        fused prep -> batch-inverse -> apply kernel trio
        (fields/pallas_ops.paffine_step_pallas_auto).
        """
        from ..fields.jnp_ops import get_backend

        w = ax.shape[0]
        if get_backend() == "pallas" and w >= 256 and (
            w % 8192 == 0 or (w <= 8192 and w % 256 == 0)
        ):
            from ..fields.pallas_ops import paffine_step_pallas_auto

            u = jnp.uint32
            axo, ayo, occo, pfo = paffine_step_pallas_auto(
                self.f,
                ax,
                ay,
                occ.astype(u).reshape(w, 1),
                rows,
                valid.astype(u).reshape(w, 1),
                pflags.astype(u).reshape(w, 1),
            )
            return axo, ayo, occo.reshape(w), pfo.reshape(w)
        f = self.f
        q = self.unpack_affine(rows)
        x2, y2 = q[..., 0, :], q[..., 1, :]
        occb = occ > 0
        d = f.sub(x2, ax)
        num = f.sub(y2, ay)
        dz = f.is_zero(d)
        numz = f.is_zero(num)
        active = valid & occb & (~dz)
        fresh = valid & (~occb)
        poison = valid & occb & dz & numz
        cancel = valid & occb & dz & (~numz)
        one = jnp.broadcast_to(f.one_mont, d.shape)
        dsub = f.select(active, d, one)
        lam = f.mul(num, f.batch_inv(dsub))
        x3 = f.sub(f.sub(f.mul(lam, lam), ax), x2)
        y3 = f.sub(f.mul(lam, f.sub(ax, x3)), ay)
        m = lambda c, a, b: jnp.where(c[..., None], a, b)  # noqa: E731
        axo = m(active, x3, m(fresh, x2, ax))
        ayo = m(active, y3, m(fresh, y2, ay))
        occo = (occb | fresh) & (~cancel)
        return axo, ayo, occo.astype(jnp.uint32), pflags | poison.astype(jnp.uint32)

    def affine_acc_to_xyzz(self, ax, ay, occ):
        """Batch-affine state -> xyzz (X=x, Y=y, ZZ=ZZZ=1; empty -> zeros).

        Used at the affine -> xyzz tier handover in the MSM (narrow tail
        tiers run the R-chained xyzz slab kernel, which amortizes launch
        latency better than per-step batch inversion)."""
        one = jnp.broadcast_to(self.f.one_mont, ax.shape)
        zero = jnp.zeros_like(ax)
        occb = (occ > 0)[..., None]
        z = jnp.where(occb, one, zero)
        return jnp.stack(
            [jnp.where(occb, ax, zero), jnp.where(occb, ay, zero), z, z], axis=-2
        )

    def affine_acc_to_projective(self, ax, ay, occ):
        """Batch-affine state -> homogeneous projective (empty -> (0:1:0)).

        The pallas path leaves coordinates in the lazy [0, 2p) domain; the
        strict Montgomery mul by 1 canonicalizes (value-preserving)."""
        f = self.f
        one = jnp.broadcast_to(f.one_mont, ax.shape)
        axc = f.mul(ax, one)
        ayc = f.mul(ay, one)
        occb = (occ > 0)[..., None]
        zero = jnp.zeros_like(ax)
        return jnp.stack(
            [
                jnp.where(occb, axc, zero),
                jnp.where(occb, ayc, one),
                jnp.where(occb, one, zero),
            ],
            axis=-2,
        )

    def xyzz_to_projective(self, acc: jnp.ndarray) -> jnp.ndarray:
        """(…, 4, 16) xyzz -> (…, 3, 16) homogeneous projective.

        x = X/ZZ, y = Y/ZZZ -> (X*ZZZ : Y*ZZ : ZZ*ZZZ); identity (ZZ == 0)
        maps to (0 : 1 : 0)."""
        f = self.f
        X, Y, ZZ, ZZZ = (acc[..., i, :] for i in range(4))
        xp, yp, zp = self._mul_layer([(X, ZZZ), (Y, ZZ), (ZZ, ZZZ)])
        inf = f.is_zero(ZZ)
        proj = jnp.stack([xp, yp, zp], axis=-2)
        return self.select(~inf, proj, self.identity_like(inf.shape))

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


def distinct_generator_multiples(
    n: int, seed: int = 0, bits: int = 128
) -> tuple[jnp.ndarray, np.ndarray]:
    """n pseudo-random distinct G1 points m_i * G, generated ON DEVICE.

    Returns (points (n,3,16) normalized to Z in {0,1}, multiples m_i as a
    host object array of python ints).  m_i are random ``bits``-bit values (bits a multiple of 16)
    (distinct whp; partial-sum collisions inside MSM buckets ~2^-(bits-40)),
    so the points are valid *distinct* MSM inputs — unlike tiled copies of a
    small point set, which make equal-point bucket adds common.  Device cost:
    ``bits`` batched complete adds (one per bit of m, table of 2^j G host
    points), ~0.6 s at n = 2^20 on one v5e chip — a one-time setup.

    The closed form sum(s_i * m_i) mod r * G makes a full-size MSM oracle
    cheap (one host scalar mul), used by bench.py's self-check.
    """
    from .host import G1

    assert bits % 16 == 0
    rng = np.random.default_rng(seed)
    m_rows = rng.integers(0, 1 << 16, size=(n, bits // 16), dtype=np.int64).astype(
        np.uint32
    )
    m_rows[:, -1] |= 1 << 15  # force the top bit: all m_i >= 2^(bits-1) > 0
    table_host = []
    g = G1.generator()
    for _ in range(bits):
        table_host.append(g)
        g = g.double()
    table = G1_JNP.encode(table_host)  # (bits, 3, 16)
    m_dev = jnp.asarray(m_rows)

    @jax.jit
    def gen(m):
        acc0 = G1_JNP.identity_like((n,))

        def body(j, acc):
            bit = (m[:, j // 16] >> (j % 16)) & 1
            return G1_JNP.select(
                bit > 0, G1_JNP.add(acc, jnp.broadcast_to(table[j], acc.shape)), acc
            )

        return jax.lax.fori_loop(0, bits, body, acc0)

    pts = G1_JNP.normalize(gen(m_dev))
    mults = np.array(
        [int.from_bytes(row.tobytes(), "little") for row in m_rows.astype("<u2")],
        dtype=object,
    )
    return pts, mults
