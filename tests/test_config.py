import os

import pytest

from radio_mapper_tpu.config import (
    Config,
    deep_merge,
    expand_env,
    generate_example_yaml,
    load_config,
)


def test_defaults_validate():
    cfg = Config().validate()
    assert cfg.sdr.sample_rate == 2_048_000
    assert cfg.tdoa.minimum_buoys == 3
    assert len(cfg.signal_detection.priority_schedule) == 5
    assert sum(e.duration for e in cfg.signal_detection.priority_schedule) == 35


def test_env_expansion_with_defaults(monkeypatch):
    monkeypatch.delenv("RMT_TEST_PORT", raising=False)
    assert expand_env("${RMT_TEST_PORT:-8081}") == 8081
    monkeypatch.setenv("RMT_TEST_PORT", "9000")
    assert expand_env("${RMT_TEST_PORT:-8081}") == 9000
    # Embedded expansion stays a string.
    assert expand_env("ws://host:${RMT_TEST_PORT:-8081}") == "ws://host:9000"
    assert expand_env("${RMT_TEST_FLAG:-true}") is True


def test_deep_merge():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    over = {"a": {"c": 20}, "e": 4}
    out = deep_merge(base, over)
    assert out == {"a": {"b": 1, "c": 20}, "d": 3, "e": 4}


def test_yaml_roundtrip(tmp_path):
    p = str(tmp_path / "example.yaml")
    generate_example_yaml(p)
    cfg = load_config(p)
    assert cfg.buoy.location.latitude == pytest.approx(35.55132, abs=1e-4)


def test_partial_yaml_merges_over_defaults(tmp_path):
    p = tmp_path / "partial.yaml"
    p.write_text(
        """
sdr:
  sample_rate: 2400000
central_server:
  websocket_port: ${RMT_WS_PORT:-8085}
tdoa:
  maximum_baseline_km: 25
"""
    )
    cfg = load_config(str(p))
    assert cfg.sdr.sample_rate == 2_400_000
    assert cfg.central_server.websocket_port == 8085
    assert cfg.tdoa.maximum_baseline_km == 25
    # untouched defaults intact
    assert cfg.web.port == 7000


def test_validation_rejects_bad_values(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("sdr:\n  sample_rate: 99\n")
    with pytest.raises(ValueError):
        load_config(str(p))
    p2 = tmp_path / "bad2.yaml"
    p2.write_text("tdoa:\n  minimum_buoys: 2\n")
    with pytest.raises(ValueError):
        load_config(str(p2))


def test_dot_path_get():
    cfg = Config()
    assert cfg.get("sdr.sample_rate") == 2_048_000
    assert cfg.get("buoy.gps.device") == "/dev/ttyACM0"
    assert cfg.get("nope.nope", "fallback") == "fallback"


def test_max_lag_from_baseline():
    cfg = Config()
    # 50 km at c at 2.048 MS/s ≈ 342 samples; +25% guard.
    lag = cfg.tdoa.max_lag_samples(2_048_000.0)
    assert 400 <= lag <= 440
