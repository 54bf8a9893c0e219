"""Sharded MSM + distributed NTT on the virtual 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkapps_tpu.curve import G1, G1_JNP, g1_msm
from zkapps_tpu.fields import FR, Fr
from zkapps_tpu.msm.distributed import msm_bucket_exchange, msm_sharded
from zkapps_tpu.ntt import ntt_host
from zkapps_tpu.ntt.distributed import DistributedNTT, powers_batched
from zkapps_tpu.parallel import make_mesh, shard_leading

random.seed(41)
G = G1.generator()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_powers_batched():
    xs = [3, 7, 11]
    out = powers_batched(FR, FR.encode(xs), 5)
    got = FR.decode(out.reshape(-1, 16))
    want = [pow(x, i, Fr.p) for x in xs for i in range(5)]
    assert got == want


def test_msm_sharded_matches_host(mesh):
    n = 64
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    scalars[0] = 0
    pa = shard_leading(mesh, G1_JNP.encode(points))
    sa = shard_leading(mesh, FR.encode(scalars, mont=False))
    out = msm_sharded(mesh, pa, sa, c=8)
    assert G1_JNP.decode(np.asarray(out)[None])[0] == g1_msm(points, scalars)


def test_msm_bucket_exchange_matches_host(mesh):
    n = 64
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    scalars[3] = 0
    scalars[4] = scalars[5]  # duplicate digits stress the bucket loop
    pa = shard_leading(mesh, G1_JNP.encode(points))
    sa = shard_leading(mesh, FR.encode(scalars, mont=False))
    out = msm_bucket_exchange(mesh, pa, sa, c=8)  # W=32 over D=8 devices
    assert G1_JNP.decode(np.asarray(out)[None])[0] == g1_msm(points, scalars)


def test_msm_bucket_exchange_window_padding(mesh):
    # c=10 -> 26 windows, not divisible by 8: exercises identity padding.
    # (Kept small: XLA:CPU's collective rendezvous has a hard 40s timeout
    # and 8 partition threads share 2 sandbox cores.)
    n = 32
    points = [G.mul(random.randrange(1, Fr.p)) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    pa = shard_leading(mesh, G1_JNP.encode(points))
    sa = shard_leading(mesh, FR.encode(scalars, mont=False))
    out = msm_bucket_exchange(mesh, pa, sa, c=10)
    assert G1_JNP.decode(np.asarray(out)[None])[0] == g1_msm(points, scalars)


def test_distributed_ntt_forward(mesh):
    log_n = 8
    n = 1 << log_n
    coeffs = [random.randrange(Fr.p) for _ in range(n)]
    dntt = DistributedNTT(mesh, log_n)
    x_mat = shard_leading(mesh, FR.encode(coeffs).reshape(dntt.n1, dntt.n2, 16))
    m = dntt.forward(x_mat)
    got = FR.decode(np.asarray(m).reshape(-1, 16))
    want = ntt_host(coeffs)
    # M[k1, k2] = X[k1 + n1*k2]  (transposed order)
    for k1 in range(dntt.n1):
        for k2 in range(dntt.n2):
            assert got[k1 * dntt.n2 + k2] == want[k1 + dntt.n1 * k2]


def test_distributed_ntt_roundtrip(mesh):
    log_n = 8
    n = 1 << log_n
    coeffs = [random.randrange(Fr.p) for _ in range(n)]
    dntt = DistributedNTT(mesh, log_n)
    x_mat = shard_leading(mesh, FR.encode(coeffs).reshape(dntt.n1, dntt.n2, 16))
    back = dntt.inverse(dntt.forward(x_mat))
    got = FR.decode(np.asarray(back).reshape(-1, 16))
    assert got == coeffs


def test_distributed_ntt_coset_roundtrip(mesh):
    """coset_forward/coset_inverse agree with the single-chip plan (the
    quotient-stage requirement)."""
    from zkapps_tpu.ntt.jnp_ntt import get_plan

    log_n = 8
    dntt = DistributedNTT(mesh, log_n)
    coeffs = [(i * 13 + 3) % Fr.p for i in range(1 << log_n)]
    x_mat = shard_leading(mesh, FR.encode(coeffs).reshape(dntt.n1, dntt.n2, 16))
    m = dntt.coset_forward(x_mat)
    # transposed order: M[k1, k2] == X[k1 + n1*k2]
    want = FR.decode(get_plan(log_n).coset_forward(FR.encode(coeffs)))
    flat = FR.decode(np.asarray(m).reshape(-1, 16))
    assert flat[1 * dntt.n2 + 2] == want[1 + dntt.n1 * 2]
    back = dntt.coset_inverse(m)
    assert FR.decode(np.asarray(back).reshape(-1, 16)) == coeffs


def test_rot_transposed_matches_flat_roll(mesh):
    log_n = 8
    dntt = DistributedNTT(mesh, log_n)
    vals = [(i * 29 + 1) % Fr.p for i in range(1 << log_n)]
    arr = FR.encode(vals)
    # to transposed layout
    t_mat = jnp.transpose(arr.reshape(dntt.n2, dntt.n1, 16), (1, 0, 2))
    for r in (0, 1, 3, dntt.n1 - 1, dntt.n1, dntt.n1 + 5, (1 << log_n) - 1):
        got = dntt.rot_transposed(t_mat, r)
        want = jnp.roll(arr, -r, axis=0)
        want_t = jnp.transpose(want.reshape(dntt.n2, dntt.n1, 16), (1, 0, 2))
        assert np.array_equal(np.asarray(got), np.asarray(want_t)), r


def test_sharded_prove_bit_identical(mesh):
    """prove(mesh=...) must produce the SAME bytes as the single-device
    prover (commit MSMs bucket-exchange, INTTs poly-sharded, quotient via
    the four-step distributed coset NTT) and verify."""
    from zkapps_tpu.circuit import Context, GateChip
    from zkapps_tpu.pcs import get_srs
    from zkapps_tpu.plonk import keygen, prove, verify

    ctx = Context()
    g = GateChip(ctx)
    xc = ctx.load_witness(5)
    out = g.add_const(g.add(g.mul(g.mul(xc, xc), xc), xc), 5)
    ctx.make_public(out)
    srs = get_srs(8, seed=b"dist-prove-test")
    pk = keygen(ctx, srs)
    proof = prove(pk, ctx, rng=random.Random(11), mesh=mesh)
    pubs = [ctx.advice[c] % Fr.p for c in ctx.publics]
    assert verify(pk.vk, pk.kzg, proof, pubs)
    proof_local = prove(pk, ctx, rng=random.Random(11))
    assert proof == proof_local
