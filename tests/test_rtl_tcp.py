"""rtl_tcp protocol loopback tests (wire-format parity with rtl_tcp.c)."""

import struct

import numpy as np
import pytest

from radio_mapper_tpu.net import rtl_tcp
from radio_mapper_tpu import sim
from radio_mapper_tpu.ingest import SimulatedSource


def test_command_packing():
    # {u8 cmd; u32 param} big-endian, 5 bytes (`rtl_tcp.c:270-290`).
    buf = rtl_tcp.pack_command(rtl_tcp.CMD_SET_FREQ, 121_500_000)
    assert len(buf) == 5
    assert buf[0] == 0x01
    assert struct.unpack(">I", buf[1:])[0] == 121_500_000
    cmd, param = rtl_tcp.unpack_command(buf)
    assert cmd == 0x01 and param == 121_500_000


def test_header_format():
    hdr = rtl_tcp.pack_header(rtl_tcp.TUNER_R820T, 29)
    assert hdr[:4] == b"RTL0"
    assert len(hdr) == 12
    tuner, gains = struct.unpack(">II", hdr[4:])
    assert tuner == rtl_tcp.TUNER_R820T and gains == 29


def test_client_server_loopback():
    scen = sim.default_scenario(signal="tone", seed=3)
    source = SimulatedSource(scen, 0)
    server = rtl_tcp.RtlTcpServer(source, host="127.0.0.1", port=18841, throttle=False)
    rtl_tcp.serve_in_thread(server)

    src = rtl_tcp.RtlTcpSource(
        "127.0.0.1", 18841, sample_rate_hz=scen.sample_rate_hz,
        center_frequency_hz=scen.center_frequency_mhz * 1e6,
    )
    try:
        iq = src.read(4096)
        assert iq.shape == (4096,)
        assert iq.dtype == np.complex64
        # uint8 quantization bounds the amplitude.
        assert np.abs(iq.real).max() <= 128.0
        # There is actual signal, not silence.
        assert np.std(iq) > 0.001
        # Retune command round-trips (server tunes the source off-channel).
        src.tune(400e6)
        iq2 = src.read(4096)
        assert iq2.shape == (4096,)
        assert src.client.tuner_type == rtl_tcp.TUNER_R820T
    finally:
        src.close()

def test_client_tune_returns_capture_plan():
    # RtlTcpClient.tune() sends the command set AND reports the achieved
    # hardware parameters via the librtlsdr register math (tuner_plan).
    scen = sim.default_scenario(signal="tone", seed=4)
    source = SimulatedSource(scen, 0)
    server = rtl_tcp.RtlTcpServer(source, host="127.0.0.1", port=18842, throttle=False)
    rtl_tcp.serve_in_thread(server)

    client = rtl_tcp.RtlTcpClient("127.0.0.1", 18842)
    try:
        plan = client.tune(121_500_000, 2_400_000, gain_tenth_db=300)
        assert plan.tuner == "r820t"
        assert plan.gain_tenth_db == 297  # snapped to the R82xx table
        assert plan.sample_rate.real_rate_hz == pytest.approx(2_400_000.0)
        assert abs(plan.lo_error_hz) < 200.0
        # The stream still flows after the command burst.
        iq = client.read_iq(2048)
        assert iq.shape == (2048,)
    finally:
        client.close()
