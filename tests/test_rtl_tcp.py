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


def test_server_mode_commands_state_machine():
    """Direct sampling / offset tuning / IF gain / gain-by-index semantics
    (`librtlsdr.c:1135-1258`, `rtl_tcp.c:325-358`)."""
    import socket
    import struct
    import time

    scen = sim.default_scenario(signal="tone", seed=5)
    source = SimulatedSource(scen, 0)
    # Zero-IF tuner (fc0013) so offset tuning is permitted.
    server = rtl_tcp.RtlTcpServer(
        source, host="127.0.0.1", port=18843, throttle=False,
        tuner_type=rtl_tcp.TUNER_FC0013,
    )
    rtl_tcp.serve_in_thread(server)
    sock = socket.create_connection(("127.0.0.1", 18843), timeout=10)
    try:
        sock.recv(12)  # header
        send = lambda cmd, p: sock.sendall(rtl_tcp.pack_command(cmd, p))
        send(rtl_tcp.CMD_SET_SAMPLE_RATE, 2_048_000)
        send(rtl_tcp.CMD_SET_FREQ, 121_500_000)
        # IF gain: stage 3, −2.5 dB packed as (3<<16)|int16(−25)
        send(rtl_tcp.CMD_SET_IF_GAIN, (3 << 16) | (0x10000 - 25))
        # offset tuning on (allowed on fc0013)
        send(rtl_tcp.CMD_SET_OFFSET_TUNING, 1)
        # gain by index 5 → fc0013 gain table entry 5
        send(rtl_tcp.CMD_SET_GAIN_BY_INDEX, 5)
        # direct sampling mode 2 (Q input) then retune
        send(rtl_tcp.CMD_SET_DIRECT_SAMPLING, 2)
        send(rtl_tcp.CMD_SET_FREQ, 3_570_000)
        deadline = time.time() + 5
        while time.time() < deadline and server.state["freq_hz"] != 3_570_000.0:
            time.sleep(0.05)
        assert server.state["if_gain"][3] == -25
        assert server.state["offset_tuning"] == 1
        assert server.state["offs_freq_hz"] == 1_740_800  # (rate/2)·1.7
        from radio_mapper_tpu.net.tuner_plan import TUNER_GAINS
        assert server.state["gain"] == TUNER_GAINS["fc0013"][5]
        assert server.state["direct_sampling"] == 2
        # direct-sampling retune applied the quantized digital IF
        assert abs(source.center_frequency_hz - 3_570_000) < 28_800_000 / (1 << 22)
    finally:
        sock.close()


def test_server_rejects_offset_tuning_on_r82xx():
    import socket
    import time

    scen = sim.default_scenario(signal="tone", seed=6)
    source = SimulatedSource(scen, 0)
    server = rtl_tcp.RtlTcpServer(
        source, host="127.0.0.1", port=18844, throttle=False,
        tuner_type=rtl_tcp.TUNER_R820T,
    )
    rtl_tcp.serve_in_thread(server)
    sock = socket.create_connection(("127.0.0.1", 18844), timeout=10)
    try:
        sock.recv(12)
        sock.sendall(rtl_tcp.pack_command(rtl_tcp.CMD_SET_OFFSET_TUNING, 1))
        sock.sendall(rtl_tcp.pack_command(rtl_tcp.CMD_SET_FREQ, 100_000_000))
        deadline = time.time() + 5
        while time.time() < deadline and server.state["freq_hz"] != 100_000_000.0:
            time.sleep(0.05)
        # R82xx: rejected, like rtlsdr_set_offset_tuning's -2 (librtlsdr.c:1230)
        assert server.state["offset_tuning"] == 0
        assert server.state["offs_freq_hz"] == 0
    finally:
        sock.close()
