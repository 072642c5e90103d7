"""rtl_power-parity scanner tests."""

import numpy as np
import pytest

from radio_mapper_tpu.ingest.sources import IQSource
from radio_mapper_tpu.tools import power_scan


class ToneSource(IQSource):
    """Synthetic wideband world: emits a tone at a fixed RF frequency; the
    scanner sees it only when tuned near it."""

    def __init__(self, tone_hz=100.3e6, sample_rate_hz=2_048_000.0, amp=30.0):
        self.tone_hz = tone_hz
        self.sample_rate_hz = sample_rate_hz
        self.center_frequency_hz = 100e6
        self.amp = amp
        self._t = 0
        self._rng = np.random.default_rng(0)

    def read(self, n):
        t = (self._t + np.arange(n)) / self.sample_rate_hz
        self._t += n
        offset = self.tone_hz - self.center_frequency_hz
        out = self._rng.normal(size=n) * 0.1 + 0j
        if abs(offset) < self.sample_rate_hz / 2:
            out = out + self.amp * np.exp(2j * np.pi * offset * t)
        return out.astype(np.complex64)


def test_plan_covers_range_without_gaps():
    plan = power_scan.plan_scan(88e6, 108e6, bin_hz=10e3, sample_rate_hz=2.048e6)
    assert plan.nfft >= 2.048e6 / 10e3
    lows = [h.low_hz for h in plan.hops]
    highs = [h.high_hz for h in plan.hops]
    assert lows[0] == 88e6
    assert highs[-1] >= 108e6 - 1
    for prev_high, nxt_low in zip(highs[:-1], lows[1:]):
        assert abs(prev_high - nxt_low) < 1.0  # contiguous
    assert len(plan.hops) < 20


def test_plan_rejects_absurd():
    with pytest.raises(ValueError):
        power_scan.plan_scan(100e6, 90e6)
    with pytest.raises(ValueError):
        power_scan.plan_scan(0, 10e9, bin_hz=1000.0, sample_rate_hz=2e6)


def test_scan_finds_tone():
    src = ToneSource(tone_hz=100.3e6)
    plan = power_scan.plan_scan(99e6, 102e6, bin_hz=20e3, sample_rate_hz=src.sample_rate_hz)
    result = power_scan.run_scan(src, plan, integration_s=0.05)
    freqs = result.frequencies_hz()
    dbs = result.flattened_db()
    assert freqs.shape == dbs.shape
    peak_freq = freqs[np.argmax(dbs)]
    assert abs(peak_freq - 100.3e6) < 40e3, peak_freq
    # Peak stands well above the median floor.
    assert dbs.max() > np.median(dbs) + 20


class BurstSource(ToneSource):
    """Tone present only in the first ~10% of each read: what rtl_power's
    peak-hold (-P) mode exists to catch (`rtl_power.c:703-706`)."""

    def read(self, n):
        out = super().read(n)
        keep = max(1, n // 10)
        out[keep:] = self._rng.normal(size=n - keep) * 0.1
        return out.astype(np.complex64)


def test_peak_hold_catches_bursts():
    lo, hi, bin_hz = 100e6, 101e6, 20e3
    rate = 2_048_000.0
    plan = power_scan.plan_scan(lo, hi, bin_hz=bin_hz, sample_rate_hz=rate)

    mean_res = power_scan.run_scan(
        BurstSource(tone_hz=100.3e6), plan, integration_s=0.2)
    peak_res = power_scan.run_scan(
        BurstSource(tone_hz=100.3e6), plan, integration_s=0.2, peak_hold=True)

    freqs = peak_res.frequencies_hz()
    peak_db = peak_res.flattened_db()
    mean_db = mean_res.flattened_db()
    # Both locate the burst, but peak-hold reports the full burst power
    # while mean integration dilutes it by the duty cycle (~10 dB here).
    assert abs(freqs[np.argmax(peak_db)] - 100.3e6) < 40e3
    assert peak_db.max() > mean_db.max() + 6.0
    # Peak-hold's floor is higher (extreme-value statistics + the burst's
    # window sidelobes are held, not diluted by duty cycle) but bounded
    # well under the burst peak itself.
    floor_lift = np.median(peak_db) - np.median(mean_db)
    assert 0.0 < floor_lift < 30.0
    assert peak_db.max() > np.median(peak_db) + 20.0


def test_csv_format():
    src = ToneSource()
    lines = power_scan.scan_to_csv(src, 99e6, 100e6, bin_hz=50e3, integration_s=0.02)
    assert len(lines) >= 1
    parts = [p.strip() for p in lines[0].split(",")]
    # date, time, hz_low, hz_high, hz_step, samples, then dB values
    assert len(parts) > 6
    float(parts[2]), float(parts[3]), float(parts[4]), int(parts[5])
    assert parts[0].count("-") == 2 and parts[1].count(":") == 2
    for v in parts[6:]:
        float(v)
