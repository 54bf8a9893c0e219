"""Typed config (A6) and structured metrics (A5)."""

import dataclasses
import json

import pytest

from zkapps_tpu import config as cfgmod
from zkapps_tpu import metrics as metmod
from zkapps_tpu.config import ZkTpuConfig, configure, current, from_env
from zkapps_tpu.fields.jnp_ops import get_backend, get_unroll


@pytest.fixture(autouse=True)
def _restore():
    before = current()
    yield
    configure(before)


def test_defaults_match_protocol_constants():
    ZkTpuConfig().validate()  # must not raise


def test_protocol_constants_are_pinned():
    with pytest.raises(ValueError, match="protocol constant"):
        configure(dataclasses.replace(ZkTpuConfig(), merkle_depth=11))
    with pytest.raises(ValueError, match="protocol constant"):
        configure(dataclasses.replace(ZkTpuConfig(), poseidon_rp=57))


def test_configure_applies_kernel_knobs():
    cfg = configure(unroll=True, backend="jnp")
    assert cfg.unroll and get_unroll()
    configure(unroll=False)
    assert not get_unroll()
    assert get_backend() == "jnp"


def test_invalid_knobs_rejected():
    for bad in (
        dict(backend="cuda"),
        dict(bucket_scheme="hash"),
        dict(msm_scheme="jacobian"),
        dict(window_bits=0),
        dict(mesh_devices=0),
    ):
        with pytest.raises(ValueError):
            configure(**bad)


def test_from_env(monkeypatch):
    monkeypatch.setenv("ZKTPU_MSM_SCHEME", "affine")
    monkeypatch.setenv("ZKTPU_WINDOW_BITS", "14")
    monkeypatch.setenv("ZKTPU_UNROLL", "0")
    cfg = from_env()
    assert cfg.msm_scheme == "affine"
    assert cfg.window_bits == 14
    assert cfg.unroll is False


def test_metrics_stage_and_counters():
    m = metmod.Metrics(enabled=True)
    with m.stage("prove.commit"):
        pass
    m.record("msm.buckets", 2.0, ops=1 << 20, unit="points")
    rep = m.report()
    assert [r["stage"] for r in rep] == ["prove.commit", "msm.buckets"]
    assert rep[1]["ops_per_s"] == pytest.approx((1 << 20) / 2.0)
    # disabled collector records nothing
    m2 = metmod.Metrics(enabled=False)
    with m2.stage("x"):
        pass
    assert m2.report() == []


def test_metrics_emit_json_lines(tmp_path, capsys):
    import io

    m = metmod.Metrics(enabled=True)
    m.record("a", 0.5)
    buf = io.StringIO()
    m.emit(out=buf)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines == [{"stage": "a", "seconds": 0.5}]
