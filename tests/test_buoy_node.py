"""Buoy node behaviors: detection pipeline, history/search, live link."""

import asyncio
import json
import time

import numpy as np
import pytest

from radio_mapper_tpu import constants, sim
from radio_mapper_tpu.runtime.buoy import BuoyNode, BuoyNodeConfig, simulated_buoy


def test_schedule_follows_wall_clock():
    entry = constants.frequency_at(0)  # cycle position 0 → 105.7
    assert entry.frequency_mhz == 105.7
    assert constants.frequency_at(6).frequency_mhz == 121.5
    assert constants.frequency_at(16).frequency_mhz == 243.0
    assert constants.frequency_at(26).frequency_mhz == 156.8
    assert constants.frequency_at(31).frequency_mhz == 101.9
    assert constants.frequency_at(35).frequency_mhz == 105.7  # wraps


def test_detect_block_produces_detections():
    # Tone offset past the ±10 kHz DC notch so the *emitter* is what's
    # detected (a DC tone is notched and only noise bins would remain).
    scen = sim.default_scenario(signal="tone", snr_db=30.0, freq_offset_hz=250e3)
    node = simulated_buoy(scen, 0)
    iq = node.source.read(node.config.block_len)
    dets = node.detect_block(iq, scen.center_frequency_mhz * 1e6)
    assert len(dets) >= 1
    d = dets[0]
    assert abs(d.frequency_mhz - (scen.center_frequency_mhz + 0.25)) < 0.01
    assert d.buoy_id == scen.buoys[0].buoy_id
    assert 0.3 <= d.confidence <= 1.0
    assert d.gps_timestamp_ns > 0
    # Waveform-TDOA payload is attached by default.
    assert d.iq_samples is not None and len(d.iq_samples) == 2048
    assert d.iq_sample_rate_hz == scen.sample_rate_hz
    assert d.iq_anchor_ns > 0


def test_history_and_search():
    scen = sim.default_scenario(signal="tone", snr_db=30.0, freq_offset_hz=250e3)
    node = simulated_buoy(scen, 0)
    iq = node.source.read(node.config.block_len)
    dets = node.detect_block(iq, 121.5e6)
    node.signal_history.extend(dets)
    assert len(node.signal_history) >= 1
    freq = node.signal_history[0].frequency_mhz
    assert node.search_signal_history(frequency_mhz=freq)
    assert node.search_signal_history(frequency_range_mhz=(freq - 1, freq + 1))
    assert node.search_signal_history(frequency_mhz=freq + 5.0) == []
    assert node.search_signal_history(frequency_mhz=freq, max_age_minutes=0.0) == []


def test_snippet_extraction():
    node = simulated_buoy(sim.default_scenario(), 0)
    iq = np.arange(16384, dtype=np.complex64)
    snip = node.extract_snippet(iq, peak_bin=1234)
    assert snip.shape == (256,)


def test_buoy_to_central_live_with_search():
    asyncio.run(_buoy_live())


async def _buoy_live():
    import websockets

    from radio_mapper_tpu.runtime.central import CentralProcessor

    central = CentralProcessor(host="127.0.0.1", ws_port=18981, http_port=18982)
    await central.start()
    scen = sim.default_scenario(signal="tone", snr_db=30.0, freq_offset_hz=250e3)
    node = simulated_buoy(
        scen, 0,
        BuoyNodeConfig(central_ws_url="ws://127.0.0.1:18981", scan_interval_s=0.2),
    )
    task = asyncio.create_task(node.run())
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not central.signal_buffer:
            await asyncio.sleep(0.2)
        assert node.config.buoy_id in central.nodes
        assert central.signal_buffer, "no detections arrived"
        det = central.signal_buffer[0]
        assert det.node_id == node.config.buoy_id

        # Send a search request to the node through its own socket.
        server_ws = central.nodes[node.config.buoy_id].websocket
        await server_ws.send(
            json.dumps(
                {
                    "type": "signal_search_request",
                    "data": {
                        "request_id": "req-1",
                        "frequency_mhz": det.frequency_mhz,
                        "max_age_minutes": 60,
                    },
                }
            )
        )
        # The response arrives as a WS message on the central side and is
        # ignored by the dispatcher (unknown type) — but we can verify the
        # node handled it by checking it produced matches locally.
        await asyncio.sleep(0.5)
        assert node.search_signal_history(frequency_mhz=det.frequency_mhz)
    finally:
        node.stop()
        task.cancel()
        await central.stop()


def test_fallback_simulation_on_capture_failure():
    """SDR failure + dev mode → simulated detections (`buoy_node.py:459-525`)."""
    import asyncio

    from radio_mapper_tpu.runtime.buoy import BuoyNode, BuoyNodeConfig

    class BrokenSource:
        sample_rate_hz = 2_048_000.0
        center_frequency_hz = 121.5e6

        def tune(self, hz):
            raise OSError("usb gone")

        def read(self, n):
            raise OSError("usb gone")

    node = BuoyNode(
        BuoyNodeConfig(buoy_id="fb0", development_mode=True),
        source=BrokenSource(),
    )
    # 0-2 random detections per dwell; a few dwells make ≥1 overwhelmingly likely
    got = []
    for _ in range(12):
        got.extend(asyncio.run(node.scan_once()))
    assert got, "fallback produced no detections across 12 dwells"
    assert all(0.3 <= d.confidence <= 0.7 for d in got)
    assert all(d.buoy_id == "fb0" for d in got)
    # production mode (no fallback): failure yields nothing
    node2 = BuoyNode(BuoyNodeConfig(buoy_id="fb1"), source=BrokenSource())
    assert asyncio.run(node2.scan_once()) == []


def test_gps_update_loop_sends_position():
    import asyncio
    import json as _json

    from radio_mapper_tpu.runtime.buoy import BuoyNode, BuoyNodeConfig

    node = BuoyNode(
        BuoyNodeConfig(buoy_id="g0", development_mode=True,
                       gps_update_interval_s=0.01)
    )
    node.gps.initialize()
    node.running = True
    sent = []

    class FakeWS:
        async def send(self, m):
            sent.append(_json.loads(m))
            if len(sent) >= 2:
                node.running = False

    asyncio.run(node._gps_update_loop(FakeWS()))
    assert sent and sent[0]["type"] == "gps_update"
    assert sent[0]["node_id"] == "g0"
    assert isinstance(sent[0]["lat"], float) and isinstance(sent[0]["lng"], float)
