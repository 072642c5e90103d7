"""Central service under sustained multi-buoy load (waveform mode on).

The reference's only live-behavior check is a 45 s passive watch
(`/root/reference/tests/test_comprehensive_system_validation.py:18-57`);
this drives a *controlled offered load* through real WebSockets — N
clients × M detections/s with u8-encoded IQ snippets — and asserts the
service plane sustains it: every message processed, fixes computed each
dwell, fix-latency p95 inside the reference's stretch budget (<5 s,
`Documents/TDOA_README.md:112-115`), and the O(window) correlation
working set bounded (no unbounded queue growth).

The saturation point is measured by `tools/load_central.py --sweep` and
recorded in docs/ARCHITECTURE.md; this test pins a rate comfortably
inside it so it stays green on loaded CI machines.
"""

import asyncio

import pytest

from tools.load_central import run_load


@pytest.mark.slow
def test_central_100_det_per_s_p95_under_5s():
    """The <5 s detection→fix stretch target (`Documents/TDOA_README.md:
    112-115`) pinned UNDER LOAD (VERDICT r4 item 7): ≥100 det/s offered
    through real WebSockets, p95 fix latency asserted inside the budget.
    The sweep (docs/ARCHITECTURE.md) measured p95 = 42 ms at this rate on
    the CI host — the 5 s assertion holds ~100× slack for loaded boxes."""
    res = asyncio.run(
        run_load(num_buoys=4, rate_per_s=100.0, duration_s=15.0,
                 ws_port=18785, http_port=18786)
    )
    offered = res["sent"] / 15.0
    assert offered >= 90.0, res  # the generator actually hit ~100 det/s
    assert res["fixes"] > 0, res
    assert 0.0 < res["fix_latency_p95_s"] < 5.0, res
    # correlation working set stays O(window), not O(test duration)
    assert res["recent_working_set_peak"] <= 100.0 * 5.0 * 2.5, res


@pytest.mark.slow
def test_central_sustains_multi_buoy_detection_load():
    res = asyncio.run(
        run_load(num_buoys=4, rate_per_s=20.0, duration_s=20.0,
                 ws_port=18781, http_port=18782)
    )
    # every offered message processed (no drops at this rate)
    assert res["received"] >= 0.95 * res["sent"], res
    # the per-dwell correlation produced fixes continuously
    assert res["fixes"] >= 0.5 * res["received"], res
    # detection→fix latency p95 far inside the 5 s stretch budget
    assert 0.0 < res["fix_latency_p95_s"] < 5.0, res
    # correlation working set stays O(window): bounded by
    # rate × correlation_window (5 s) with slack, NOT by test duration
    assert res["recent_working_set_peak"] <= 20.0 * 5.0 * 2.5, res
