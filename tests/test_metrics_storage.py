"""Metrics registry and persistence tests."""

import json
import time

import pytest

from radio_mapper_tpu.runtime.datamodel import LiveSignalDetection, TriangulatedSignal, utc_now_iso
from radio_mapper_tpu.utils.metrics import MetricsRegistry
from radio_mapper_tpu.utils.storage import SignalStore


def _det(node="b1", freq=121.5, ts=None):
    return LiveSignalDetection(
        node_id=node,
        frequency_mhz=freq,
        signal_strength_dbm=-60.0,
        timestamp_utc=ts or utc_now_iso(),
        gps_timestamp_ns=time.time_ns(),
        lat=35.5,
        lng=-97.5,
        confidence=0.8,
        signal_type="emergency",
        iq_samples=[complex(1, 2)] * 4,
    )


def _fix():
    return TriangulatedSignal(
        signal_id="SIG_1",
        frequency_mhz=121.5,
        estimated_lat=35.47,
        estimated_lng=-97.51,
        confidence=0.9,
        detected_by=["b1", "b2", "b3"],
        detection_timestamps=[utc_now_iso()],
        signal_type="emergency",
        triangulation_method="gcc-phat+lm",
        accuracy_meters=42.0,
    )


def test_metrics_counters_gauges_timers():
    m = MetricsRegistry()
    m.inc("a")
    m.inc("a", 2)
    m.set_gauge("g", 3.5)
    with m.timer("t").time():
        time.sleep(0.01)
    snap = m.snapshot()
    assert snap["counters"]["a"] == 3
    assert snap["gauges"]["g"] == 3.5
    assert snap["timers"]["t"]["count"] == 1
    assert snap["timers"]["t"]["mean_s"] >= 0.009


def test_prometheus_rendering():
    m = MetricsRegistry()
    m.inc("detections_received", 7)
    m.set_gauge("connected-nodes", 4)
    with m.timer("solve.time").time():
        pass
    text = m.render_prometheus()
    assert "detections_received 7" in text
    assert "connected_nodes 4" in text
    assert 'solve_time_seconds{quantile="0.5"}' in text


def test_store_roundtrip(tmp_path):
    store = SignalStore(str(tmp_path))
    det = _det()
    store.append_detection(det)
    store.append_fix(_fix())
    store.close()

    store2 = SignalStore(str(tmp_path))
    dets = store2.load_detections()
    fixes = store2.load_fixes()
    assert len(dets) == 1 and len(fixes) == 1
    assert dets[0].node_id == "b1"
    assert dets[0].iq_samples is None  # snippets not persisted
    assert fixes[0].accuracy_meters == 42.0


def test_store_age_filter(tmp_path):
    store = SignalStore(str(tmp_path), max_age_hours=1.0)
    old = _det(ts="2020-01-01T00:00:00+00:00")
    store.append_detection(old)
    store.append_detection(_det())
    store.close()
    assert len(SignalStore(str(tmp_path), max_age_hours=1.0).load_detections()) == 1


def test_store_tolerates_corrupt_lines(tmp_path):
    store = SignalStore(str(tmp_path))
    store.append_detection(_det())
    store.close()
    files = list(tmp_path.glob("detections-*.jsonl"))
    with open(files[0], "a") as f:
        f.write("NOT JSON {{{\n")
        f.write(json.dumps({"unexpected": "shape"}) + "\n")
    assert len(SignalStore(str(tmp_path)).load_detections()) == 1


def test_central_resume_and_metrics_endpoint(tmp_path):
    import asyncio

    async def run():
        import aiohttp

        from radio_mapper_tpu.runtime.central import CentralProcessor

        store = SignalStore(str(tmp_path))
        store.append_detection(_det())
        store.append_fix(_fix())
        store.close()

        central = CentralProcessor(
            host="127.0.0.1", ws_port=18971, http_port=18972,
            store=SignalStore(str(tmp_path)),
        )
        assert len(central.signal_buffer) == 1  # resumed
        assert len(central.triangulated_signals) == 1
        await central.start()
        try:
            async with aiohttp.ClientSession() as http:
                async with http.get("http://127.0.0.1:18972/metrics") as r:
                    text = await r.text()
                    assert r.status == 200
                    assert "buffered_detections 1" in text
                async with http.get("http://127.0.0.1:18972/api/signals") as r:
                    sigs = await r.json()
                    assert len(sigs) == 1  # resumed fix visible via API
        finally:
            await central.stop()

    asyncio.run(run())


def test_emergency_alerter_thresholds_and_repeat():
    from radio_mapper_tpu.runtime.alerts import EmergencyAlerter

    alerter = EmergencyAlerter(confidence_threshold=0.8, repeat_alert_minutes=5.0,
                               methods=["log"])
    sig = _fix()  # emergency, conf 0.9
    assert alerter.process(sig, now=1000.0)
    # Repeat within the window is suppressed.
    assert not alerter.process(sig, now=1100.0)
    # After the window it fires again.
    assert alerter.process(sig, now=1000.0 + 301.0)
    # Below-threshold confidence never alerts.
    import dataclasses

    weak = dataclasses.replace(sig, confidence=0.5, frequency_mhz=243.0)
    assert not alerter.process(weak, now=2000.0)
    # Non-emergency types never alert.
    fm = dataclasses.replace(sig, signal_type="fm_radio", frequency_mhz=101.9)
    assert not alerter.process(fm, now=2000.0)
    assert alerter.alerts_sent == 2


def test_alerter_webhook_routing():
    from radio_mapper_tpu.runtime.alerts import EmergencyAlerter

    calls = []
    alerter = EmergencyAlerter(
        methods=["webhook"], webhook_url="http://example/hook",
        webhook_post=lambda url, payload: calls.append((url, payload)),
    )
    assert alerter.process(_fix(), now=1.0)
    assert calls and calls[0][0] == "http://example/hook"
    assert calls[0][1]["type"] == "emergency_alert"
