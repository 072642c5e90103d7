"""Runtime layer tests: data model, GPS/NMEA, TDoA engine, live service.

The live test follows the reference's integration pattern
(`tests/test_system_integration.py`): start the central service, connect
simulated buoys over real WebSockets, inject detections, and verify the
HTTP API reflects nodes/detections/triangulations — all in-process.
"""

import asyncio
import dataclasses
import json
import time

import numpy as np
import pytest

from radio_mapper_tpu.runtime import gps as gps_mod
from radio_mapper_tpu.runtime.datamodel import (
    LiveSignalDetection,
    SignalDetection,
    to_json,
    utc_now_iso,
)
from radio_mapper_tpu.runtime.tdoa_engine import (
    TDoAEngine,
    filter_time_window,
    group_by_frequency,
)
from radio_mapper_tpu.runtime.datamodel import BuoyPosition
from radio_mapper_tpu.constants import SPEED_OF_LIGHT_M_S
from radio_mapper_tpu import sim


# ---------------------------------------------------------------- datamodel


def test_numpy_json_encoder():
    d = {"a": np.float32(1.5), "b": np.arange(3), "c": np.complex64(1 + 2j)}
    out = json.loads(to_json(d))
    assert out == {"a": 1.5, "b": [0, 1, 2], "c": [1.0, 2.0]}


def test_live_detection_from_buoy_message():
    msg = {
        "buoy_id": "b1",
        "frequency_mhz": 121.5,
        "signal_strength_dbm": -60.0,
        "timestamp_utc": "2026-08-17T00:00:00+00:00",
        "gps_timestamp_ns": 123,
        "lat": 35.0,
        "lng": -97.0,
        "confidence": 0.8,
        "signal_type": "emergency",
        "iq_sample_file": "drop-me",
        "correlation_id": "drop-me-too",
    }
    det = LiveSignalDetection.from_message(msg)
    assert det.node_id == "b1"
    assert det.bandwidth_hz == 10_000.0


# ---------------------------------------------------------------- GPS/NMEA


def test_nmea_coord_conversion():
    # 3530.50 N → 35 + 30.5/60
    assert gps_mod.nmea_coord_to_decimal("3530.50", "N") == pytest.approx(35.5083, abs=1e-3)
    assert gps_mod.nmea_coord_to_decimal("09732.00", "W") == pytest.approx(-97.5333, abs=1e-3)


def test_parse_gga():
    line = "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47"
    fix = gps_mod.parse_nmea_sentence(line)
    assert fix is not None and fix.valid
    assert fix.lat == pytest.approx(48.1173, abs=1e-3)
    assert fix.lng == pytest.approx(11.5167, abs=1e-3)
    assert fix.num_satellites == 8
    assert fix.altitude_m == pytest.approx(545.4)


def test_parse_rmc_and_invalid():
    rmc = "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A"
    fix = gps_mod.parse_nmea_sentence(rmc)
    assert fix is not None and fix.valid
    assert gps_mod.parse_nmea_sentence("$GPGSV,3,1,11") is None
    assert gps_mod.parse_nmea_sentence("garbage") is None
    # V = void fix must not validate
    void = "$GPRMC,123519,V,4807.038,N,01131.000,E,,,230394,,*00"
    assert not gps_mod.parse_nmea_sentence(void).valid


def test_gps_source_dev_mode():
    src = gps_mod.GPSTimeSource(35.55, -97.53, development_mode=True)
    assert src.initialize()
    assert src.gps_locked and src.timing_accuracy_ns == 100_000
    lat, lng = src.get_position()
    assert abs(lat - 35.55) < 1e-3 and abs(lng + 97.53) < 1e-3
    iso, ns = src.get_precise_timestamp()
    assert abs(ns / 1e9 - time.time()) < 5.0


# --------------------------------------------------------------- engine


def _fabricate_detections(scen, t0_ns=1_000_000_000_000):
    """Reference-style synthetic detections: geometric travel times
    (pattern: `tests/test_tdoa_validation.py:262-302`)."""
    anchors = scen.buoy_enu()
    emitter = scen.emitter_enu(scen.emitters[0])
    dets = []
    for k, b in enumerate(scen.buoys):
        d = np.linalg.norm(anchors[k] - emitter)
        delay_ns = int(d / SPEED_OF_LIGHT_M_S * 1e9)
        dets.append(
            SignalDetection(
                buoy_id=b.buoy_id,
                frequency_mhz=121.5,
                signal_strength_dbm=-55.0,
                timestamp_utc="2026-08-17T00:00:00+00:00",
                gps_timestamp_ns=t0_ns + delay_ns,
                lat=b.lat,
                lng=b.lng,
                confidence=0.9,
                signal_type="emergency",
            )
        )
    return dets


def test_grouping_and_windowing():
    scen = sim.default_scenario()
    dets = _fabricate_detections(scen)
    dets[1] = dataclasses.replace(dets[1], frequency_mhz=121.505)  # within ±0.01
    dets[2] = dataclasses.replace(dets[2], frequency_mhz=156.8)  # other band
    groups = group_by_frequency(dets)
    assert len(groups) == 2
    old = dataclasses.replace(dets[0], gps_timestamp_ns=dets[0].gps_timestamp_ns - int(60e9))
    kept = filter_time_window([old] + dets, 10.0)
    assert old not in kept


def test_engine_end_to_end_fix():
    scen = sim.default_scenario(emitter_lat=35.47, emitter_lng=-97.51)
    engine = TDoAEngine()
    for b in scen.buoys:
        engine.register_buoy(BuoyPosition(b.buoy_id, b.lat, b.lng, b.alt_m, 1000))
    results = engine.process_signal_detections(_fabricate_detections(scen))
    assert len(results) == 1
    r = results[0]
    assert r.signal_type == "emergency"
    assert abs(r.estimated_lat - 35.47) < 0.002
    assert abs(r.estimated_lng + 97.51) < 0.002
    assert r.method == "hyperbolic-lm"
    assert len(r.contributing_buoys) == 4


def test_engine_requires_min_buoys():
    scen = sim.default_scenario()
    engine = TDoAEngine()
    for b in scen.buoys[:2]:
        engine.register_buoy(BuoyPosition(b.buoy_id, b.lat, b.lng))
    dets = _fabricate_detections(scen)[:2]
    assert engine.process_signal_detections(dets) == []


def test_engine_network_status():
    engine = TDoAEngine()
    st = engine.get_network_status()
    assert st["registered_buoys"] == 0 and not st["triangulation_ready"]


# ------------------------------------------------------------ live service


def test_central_service_live():
    asyncio.run(_central_service_live())


async def _central_service_live():
    import aiohttp
    import websockets

    from radio_mapper_tpu.runtime.central import CentralProcessor

    central = CentralProcessor(
        host="127.0.0.1", ws_port=18711, http_port=18712, min_nodes=3
    )
    await central.start()
    try:
        scen = sim.default_scenario(emitter_lat=35.47, emitter_lng=-97.51)
        dets = _fabricate_detections(scen, t0_ns=time.time_ns())
        conns = []
        for k, b in enumerate(scen.buoys):
            ws = await websockets.connect("ws://127.0.0.1:18711")
            await ws.send(
                json.dumps(
                    {
                        "type": "node_registration",
                        "node_id": b.buoy_id,
                        "lat": b.lat,
                        "lng": b.lng,
                        "timing_accuracy_ns": 1000,
                    }
                )
            )
            ack = json.loads(await ws.recv())
            assert ack["type"] == "registration_ack"
            conns.append(ws)

        # Inject one detection per buoy (same frequency, now-ish timestamps).
        for ws, det in zip(conns, dets):
            payload = dataclasses.asdict(det)
            payload["timestamp_utc"] = det.timestamp_utc = __import__(
                "radio_mapper_tpu.runtime.datamodel", fromlist=["utc_now_iso"]
            ).utc_now_iso()
            await ws.send(json.dumps({"type": "signal_detection", "data": payload}))

        # Wait for triangulation: the solve runs in an executor and the
        # first call pays JIT compilation, so poll instead of fixed-sleep.
        deadline = time.time() + 30.0
        while time.time() < deadline and not central.triangulated_signals:
            await asyncio.sleep(0.25)

        async with aiohttp.ClientSession() as http:
            async with http.get("http://127.0.0.1:18712/api/nodes") as r:
                nodes = await r.json()
                assert len(nodes) == 4
                assert {n["id"] for n in nodes} == {b.buoy_id for b in scen.buoys}
            async with http.get("http://127.0.0.1:18712/api/detections") as r:
                det_list = await r.json()
                assert len(det_list) == 4
                assert det_list[0]["frequency_mhz"] == pytest.approx(121.5)
            async with http.get("http://127.0.0.1:18712/api/signals") as r:
                sigs = await r.json()
                assert len(sigs) >= 1
                s = sigs[-1]
                assert abs(s["lat"] - 35.47) < 0.01
                assert abs(s["lng"] + 97.51) < 0.01
                assert s["triangulated"] is True
                assert "Emergency" in s["classification"]
            async with http.post(
                "http://127.0.0.1:18712/api/search_signal",
                json={"frequency_mhz": 121.5},
            ) as r:
                found = await r.json()
                assert found["count"] >= 1
            async with http.get("http://127.0.0.1:18712/api/system-status") as r:
                status = await r.json()
                assert status["connected_nodes"] == 4
                assert status["network"]["triangulation_ready"]

        # Buoys receive the triangulation broadcast.
        msg = json.loads(await asyncio.wait_for(conns[0].recv(), timeout=5))
        assert msg["type"] == "triangulation_result"
        assert abs(msg["data"]["estimated_lat"] - 35.47) < 0.01

        for ws in conns:
            await ws.close()
        deadline = time.time() + 10.0
        while time.time() < deadline and central.nodes:
            await asyncio.sleep(0.1)
        assert len(central.nodes) == 0  # eviction on disconnect
    finally:
        await central.stop()


def test_heartbeat_and_malformed_json():
    asyncio.run(_heartbeat_and_malformed_json())


async def _heartbeat_and_malformed_json():
    import websockets

    from radio_mapper_tpu.runtime.central import CentralProcessor

    central = CentralProcessor(host="127.0.0.1", ws_port=18721, http_port=18722)
    await central.start()
    try:
        ws = await websockets.connect("ws://127.0.0.1:18721")
        await ws.send("this is not json{{{")  # must not kill the server
        await ws.send(
            json.dumps({"type": "node_registration", "node_id": "hb-node"})
        )
        ack = json.loads(await ws.recv())
        assert ack["type"] == "registration_ack"
        await ws.send(json.dumps({"type": "heartbeat", "node_id": "hb-node"}))
        hb = json.loads(await ws.recv())
        assert hb["type"] == "heartbeat_ack"
        # Default-position fallback applied (`central_processor.py:271`).
        assert central.nodes["hb-node"].position[0] == pytest.approx(35.5513, abs=1e-3)
        await ws.close()
    finally:
        await central.stop()


def test_stale_node_marking():
    asyncio.run(_stale_node())


async def _stale_node():
    from datetime import datetime, timedelta, timezone

    import aiohttp

    from radio_mapper_tpu.runtime.central import CentralProcessor

    central = CentralProcessor(
        host="127.0.0.1", ws_port=18991, http_port=18992, stale_after_s=1.0
    )
    await central.start()
    try:
        import websockets

        ws = await websockets.connect("ws://127.0.0.1:18991")
        await ws.send(json.dumps({"type": "node_registration", "node_id": "n1"}))
        await ws.recv()
        # Backdate the heartbeat.
        central.nodes["n1"].last_seen = datetime.now(timezone.utc) - timedelta(seconds=5)
        async with aiohttp.ClientSession() as http:
            async with http.get("http://127.0.0.1:18992/api/nodes") as r:
                nodes = await r.json()
                assert nodes[0]["status"] == "stale"
        # A heartbeat revives it.
        await ws.send(json.dumps({"type": "heartbeat", "node_id": "n1"}))
        await ws.recv()
        async with aiohttp.ClientSession() as http:
            async with http.get("http://127.0.0.1:18992/api/nodes") as r:
                nodes = await r.json()
                assert nodes[0]["status"] == "active"
        await ws.close()
    finally:
        await central.stop()


def test_webapp_devices_endpoint():
    asyncio.run(_webapp_devices())


async def _webapp_devices():
    import aiohttp

    from radio_mapper_tpu.webapp.app import WebApp

    # No central running on that port: dev_mock supplies canned nodes,
    # which /api/devices reshapes into device records
    # (reference webapp/app.py:186-222 format).
    app = WebApp("http://127.0.0.1:19986", host="127.0.0.1", port=19987,
                 dev_mock=True)
    await app.start()
    try:
        async with aiohttp.ClientSession() as session:
            async with session.get("http://127.0.0.1:19987/api/devices") as r:
                assert r.status == 200
                devices = await r.json()
        assert len(devices) == 3
        for d in devices:
            assert d["type"] == "buoy"
            assert d["status"] == "active"
            assert "lastSeenFormatted" in d and "UTC" in d["lastSeenFormatted"]
            assert isinstance(d["lat"], float) and isinstance(d["lng"], float)
    finally:
        await app.stop()


def test_correlation_triggers_coalesce():
    """N triggers arriving during one slow pass collapse into (at most)
    one follow-up pass — the mechanism behind the 7x capacity gain."""
    import asyncio

    from radio_mapper_tpu.runtime.central import CentralProcessor

    async def run():
        central = CentralProcessor(host="127.0.0.1", ws_port=0, http_port=0)
        calls = 0

        async def slow_pass():
            nonlocal calls
            calls += 1
            await asyncio.sleep(0.05)

        central.process_signal_correlations = slow_pass
        for _ in range(10):
            central._schedule_correlations()
            await asyncio.sleep(0.01)
        # let the worker drain
        while central._corr_task is not None and not central._corr_task.done():
            await asyncio.sleep(0.01)
        return calls

    calls = asyncio.run(run())
    # 10 triggers over ~100 ms of 50 ms passes: ~2-4 passes, never 10
    assert 1 <= calls <= 5, calls


def test_timestamp_mode_ellipse_floored_by_clock_accuracy():
    """A timestamp-differencing fix with 100 µs clocks must report a
    c·(clock σ)-scale ellipse, never a deceptively tiny one (3-receiver
    all-pairs sets fit exactly, so the residual estimate alone is blind)."""
    from radio_mapper_tpu import sim
    from radio_mapper_tpu.runtime.datamodel import BuoyPosition, SignalDetection
    from radio_mapper_tpu.runtime.tdoa_engine import TDoAEngine

    scen = sim.default_scenario()
    eng = TDoAEngine(waveform_mode="never")
    for b in scen.buoys:
        eng.register_buoy(
            BuoyPosition(buoy_id=b.buoy_id, lat=b.lat, lng=b.lng,
                         timing_accuracy_ns=100_000)
        )
    dets = [
        SignalDetection(
            buoy_id=b.buoy_id, frequency_mhz=121.5, signal_strength_dbm=-50.0,
            timestamp_utc=utc_now_iso(), gps_timestamp_ns=1_000_000_000 + k,
            lat=b.lat, lng=b.lng, confidence=0.9, signal_type="emergency",
        )
        for k, b in enumerate(scen.buoys)
    ]
    results = eng.process_signal_detections(dets)
    assert results and results[0].method == "hyperbolic-lm"
    # 100 µs clocks ⇒ c·1e-4 ≈ 30 km per-receiver σ; the ellipse must be
    # of that order, not meters
    assert results[0].ellipse_major_m >= 10_000.0, results[0].ellipse_major_m


def test_numpy_json_encoder_handles_bool_and_scalars():
    """np.bool_ (e.g. a converged flag or validity mask leaking into a
    wire payload) must serialize, not crash the service JSON path."""
    out = json.loads(
        to_json({"b": np.bool_(True), "i": np.int64(3), "f": np.float32(1.5),
                 "arr": np.array([1.0, 2.0])})
    )
    assert out == {"b": True, "i": 3, "f": 1.5, "arr": [1.0, 2.0]}
