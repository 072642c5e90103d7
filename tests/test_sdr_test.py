"""SDR health benchmark (rtl_test parity): drop detection + PPM measurement.

Reference behaviors reproduced: 8-bit counter test mode drop accounting
(`Code/src/rtl_test.c:109-135`) and sample-clock PPM benchmark against the
monotonic clock (`Code/src/rtl_test.c:137-213`), both hermetic here via the
framework's own rtl_tcp server over a simulated source.
"""

import numpy as np
import pytest

from radio_mapper_tpu.tools.sdr_test import DropStats, measure_ppm


def test_drop_stats_clean_stream():
    s = DropStats()
    stream = (np.arange(100_000) % 256).astype(np.uint8)
    # feed in uneven chunks to exercise the cross-block seam
    for chunk in np.array_split(stream, 7):
        s.update(chunk)
    assert s.total_bytes == 100_000
    assert s.lost_bytes == 0
    assert s.gaps == 0
    assert s.loss_ratio == 0.0


def test_drop_stats_detects_injected_gaps():
    stream = (np.arange(4096) % 256).astype(np.uint8)
    # drop 10 bytes mid-stream and 3 bytes at a chunk boundary
    cut = np.concatenate([stream[:1000], stream[1010:2048]])
    s = DropStats()
    s.update(cut)
    s.update(stream[2051:3000])  # 3 more lost across the seam
    assert s.gaps == 2
    assert s.lost_bytes == 13
    assert s.total_bytes == cut.size + (3000 - 2051)
    assert 0 < s.loss_ratio < 0.01


def test_drop_stats_wraparound_gap():
    # a gap that crosses the 8-bit wrap: ...254, 255, [0,1,2 lost], 3...
    s = DropStats()
    s.update(np.array([253, 254, 255, 3, 4], np.uint8))
    assert s.gaps == 1
    assert s.lost_bytes == 3


def test_measure_ppm_of_paced_source():
    # A reader that delivers exactly 1000 samples per ~1 ms sleep measures
    # close to the implied rate; assert the arithmetic, not the scheduler.
    import time

    def read(n):
        time.sleep(0.001)
        return np.zeros(n, np.complex64)

    r = measure_ppm(read, nominal_rate_hz=1000 / 0.001, duration_s=0.2,
                    block_samples=1000, warmup_blocks=1)
    assert r.total_samples >= 1000
    assert r.duration_s >= 0.2
    # sleep overhead only slows delivery: measured <= nominal (+1% slack)
    assert r.measured_rate_hz <= r.nominal_rate_hz * 1.01
    assert r.ppm_error == pytest.approx(
        (r.measured_rate_hz - r.nominal_rate_hz) / r.nominal_rate_hz * 1e6
    )


def test_rtl_tcp_test_mode_counter_end_to_end():
    """Server test mode emits a gap-free 8-bit counter; client sees 0 drops."""
    from radio_mapper_tpu import sim
    from radio_mapper_tpu.ingest import SimulatedSource
    from radio_mapper_tpu.net import rtl_tcp

    server = rtl_tcp.RtlTcpServer(
        SimulatedSource(sim.default_scenario(signal="tone"), 0),
        host="127.0.0.1", port=18967, throttle=False,
    )
    rtl_tcp.serve_in_thread(server)

    client = rtl_tcp.RtlTcpClient("127.0.0.1", 18967)
    try:
        client.set_test_mode(True)
        stats = DropStats()
        # Commands race the already-flowing IQ stream (same as real
        # rtl_tcp): skip bytes until the counter pattern locks, then
        # every subsequent byte must be gap-free.
        locked = False
        deadline = 200
        while stats.total_bytes < 200_000 and deadline:
            deadline -= 1
            raw = np.frombuffer(client._read_exact(16384), np.uint8)
            if not locked:
                diff = (raw[1:].astype(np.int16) - raw[:-1].astype(np.int16)) % 256
                if not np.all(diff == 1):
                    continue
                locked = True
            stats.update(raw)
        assert locked, "server never switched to counter mode"
        assert stats.total_bytes >= 200_000
        assert stats.lost_bytes == 0 and stats.gaps == 0
        client.set_test_mode(False)
    finally:
        client.close()


def test_sdrtest_cli_loopback(capsys):
    """Full CLI drive: in-process server, counter lock, zero drops."""
    import json

    from radio_mapper_tpu import cli

    cli.main([
        "sdrtest", "--loopback", "--rtl-tcp", "127.0.0.1:18991",
        "--drop-seconds", "0.5", "--ppm-seconds", "0.3",
    ])
    out = capsys.readouterr().out
    report = json.loads(out[: out.rindex("}") + 1])
    assert report["drop_test"]["lost_bytes"] == 0
    assert report["drop_test"]["gaps"] == 0
    assert report["drop_test"]["total_bytes"] > 100_000
    assert report["ppm_test"]["total_samples"] > 0
