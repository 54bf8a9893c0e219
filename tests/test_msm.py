"""MSM vs host oracle, including degenerate scalar distributions."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zkapps_tpu.curve import G1, G1_JNP, g1_msm
from zkapps_tpu.fields import FR, Fr
from zkapps_tpu.msm import msm, signed_digits

random.seed(31)
G = G1.generator()


def digits_value(ids, negs, c):
    v = 0
    for w in range(ids.shape[0]):
        d = int(ids[w]) * (-1 if bool(negs[w]) else 1)
        v += d << (c * w)
    return v


def test_signed_digits_reconstruct():
    xs = [0, 1, Fr.p - 1, (1 << 128) - 1] + [random.randrange(Fr.p) for _ in range(8)]
    arr = FR.encode(xs, mont=False)
    for c in (8, 13, 16):
        ids, negs = jax.jit(lambda a: signed_digits(a, c))(arr)
        ids, negs = np.asarray(ids), np.asarray(negs)
        half = 1 << (c - 1)
        assert ids.max() <= half
        for i, x in enumerate(xs):
            assert digits_value(ids[:, i], negs[:, i], c) == x


def run_msm(points, scalars, c=None):
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    out = msm(pa, sa, c)
    return G1_JNP.decode(out[None])[0]


def test_msm_small_exact():
    n = 32
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    # degenerate cases folded in
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = Fr.p - 1
    scalars[3] = scalars[4] = scalars[5] = 12345  # duplicates
    points[6] = G1.identity()
    want = g1_msm(points, scalars)
    assert run_msm(points, scalars, c=8) == want


def test_msm_all_zero():
    points = [G.mul(i + 1) for i in range(8)]
    scalars = [0] * 8
    assert run_msm(points, scalars, c=8).is_identity


def test_msm_single_point():
    k = random.randrange(Fr.p)
    assert run_msm([G], [k], c=8) == G.mul(k)


def test_msm_heavy_duplicates():
    """All scalars identical — worst-case bucket occupancy must stay correct."""
    n = 24
    points = [G.mul(i + 2) for i in range(n)]
    scalars = [7777] * n
    want = g1_msm(points, scalars)
    assert run_msm(points, scalars, c=8) == want


def test_msm_window_sizes_agree():
    n = 16
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    want = g1_msm(points, scalars)
    for c in (8, 12):
        assert run_msm(points, scalars, c=c) == want


def test_msm_xyzz_scheme_matches_complete():
    """Incomplete-xyzz bucket kernel == complete kernel on distinct points.

    Distinct random multiples (the real MSM input shape: SRS powers /
    committed polys) -> no equal-point adds -> poison must be 0 and the
    window sums must agree exactly with the complete RCB15 path.
    """
    from zkapps_tpu.msm.jnp_msm import msm_window_sums_checked

    n, c = 48, 8
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    points[5] = G1.identity()
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = Fr.p - 1
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    ws_c, p_c = msm_window_sums_checked(pa, sa, c, "complete")
    ws_x, p_x = msm_window_sums_checked(pa, sa, c, "xyzz")
    assert int(p_c) == 0 and int(p_x) == 0
    for a, b in zip(G1_JNP.decode(ws_c), G1_JNP.decode(ws_x)):
        assert a == b


def test_msm_xyzz_poison_detected_and_fallback_exact():
    """Equal-point bucket adds must set the poison flag, and msm_to_host must
    re-run with the complete kernel and still return the exact result."""
    from zkapps_tpu.msm.jnp_msm import msm_to_host, msm_window_sums_checked

    n, c = 16, 8
    # duplicate (point, scalar) pairs guarantee same-bucket equal-point adds
    points = [G.mul(i + 2) for i in range(n // 2)] * 2
    scalars = [random.randrange(Fr.p) for _ in range(n // 2)] * 2
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    _, poison = msm_window_sums_checked(pa, sa, c, "xyzz")
    assert int(poison) > 0
    want = g1_msm(points, scalars)
    got = msm_to_host(pa, sa, c, scheme="xyzz")
    assert got == want


def test_msm_xyzz_cancellation_exact():
    """P + (-P) inside one bucket is handled exactly (no poison)."""
    from zkapps_tpu.msm.jnp_msm import msm_to_host, msm_window_sums_checked

    c = 8
    p0 = G.mul(1234567)
    points = [p0, p0.neg(), G.mul(42)]
    s = random.randrange(1, 1 << (c - 2))  # same positive digit each window
    scalars = [s, s, random.randrange(Fr.p)]
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    _, poison = msm_window_sums_checked(pa, sa, c, "xyzz")
    assert int(poison) == 0
    want = g1_msm(points, scalars)
    assert msm_to_host(pa, sa, c, scheme="xyzz") == want


def _force_affine(monkeypatch, min_width=1, floor=None):
    """Route scheme='affine' through the batch-affine tiers at tiny widths."""
    from zkapps_tpu.msm import jnp_msm

    monkeypatch.setattr(jnp_msm, "AFFINE_MIN_WIDTH", min_width)
    if floor is not None:
        orig = jnp_msm._tier_widths.__wrapped__ if hasattr(jnp_msm._tier_widths, "__wrapped__") else jnp_msm._tier_widths
        monkeypatch.setattr(jnp_msm, "_tier_widths", lambda full, _o=orig: _o(full, floor))


def test_msm_affine_scheme_matches_complete(monkeypatch):
    """Batch-affine bucket kernel == complete kernel on distinct points."""
    from zkapps_tpu.msm.jnp_msm import msm_window_sums_checked

    _force_affine(monkeypatch)
    n, c = 48, 8
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    points[5] = G1.identity()
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = Fr.p - 1
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    ws_c, p_c = msm_window_sums_checked(pa, sa, c, "complete")
    ws_a, p_a = msm_window_sums_checked(pa, sa, c, "affine")
    assert int(p_c) == 0 and int(p_a) == 0
    for a, b in zip(G1_JNP.decode(ws_c), G1_JNP.decode(ws_a)):
        assert a == b


def test_msm_affine_poison_detected_and_fallback_exact(monkeypatch):
    """Equal-point adds poison the affine kernel; msm_to_host re-runs exact."""
    from zkapps_tpu.msm.jnp_msm import msm_to_host, msm_window_sums_checked

    _force_affine(monkeypatch)
    n, c = 16, 8
    points = [G.mul(i + 2) for i in range(n // 2)] * 2
    scalars = [random.randrange(Fr.p) for _ in range(n // 2)] * 2
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    _, poison = msm_window_sums_checked(pa, sa, c, "affine")
    assert int(poison) > 0
    want = g1_msm(points, scalars)
    got = msm_to_host(pa, sa, c, scheme="affine")
    assert got == want


def test_msm_affine_cancellation_exact(monkeypatch):
    """P + (-P) empties the affine lane exactly (no poison), and the lane
    re-fills correctly if more addends follow."""
    from zkapps_tpu.msm.jnp_msm import msm_to_host, msm_window_sums_checked

    _force_affine(monkeypatch)
    c = 8
    p0 = G.mul(1234567)
    points = [p0, p0.neg(), G.mul(42), G.mul(99)]
    s = random.randrange(1, 1 << (c - 2))  # same positive digit each window
    scalars = [s, s, random.randrange(Fr.p), s]
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    _, poison = msm_window_sums_checked(pa, sa, c, "affine")
    assert int(poison) == 0
    want = g1_msm(points, scalars)
    assert msm_to_host(pa, sa, c, scheme="affine") == want


def test_msm_affine_xyzz_tail_handover(monkeypatch):
    """Affine tiers + xyzz tail tiers must agree with the complete kernel
    (exercises the affine->xyzz state conversion at the tier boundary)."""
    from zkapps_tpu.msm.jnp_msm import msm_window_sums_checked

    _force_affine(monkeypatch, min_width=2049, floor=512)
    n, c = 64, 8  # width = 32 windows * 129 = 4128 -> tiers 4128/2048/1024/512
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    scalars[3] = scalars[4] = 7  # duplicate scalars: deeper buckets
    pa = G1_JNP.encode(points)
    sa = FR.encode(scalars, mont=False)
    ws_c, _ = msm_window_sums_checked(pa, sa, c, "complete")
    ws_a, p_a = msm_window_sums_checked(pa, sa, c, "affine")
    assert int(p_a) == 0
    for a, b in zip(G1_JNP.decode(ws_c), G1_JNP.decode(ws_a)):
        assert a == b
