"""Snippet pattern matching (the capability behind the reference's stored
IQ snippets, `iq_stream_client.py:306-315` — extracted there but never
matched against)."""

import numpy as np
import pytest

from radio_mapper_tpu.ops.match import snippet_match_scores_np

N = 256


def _noise(seed, n=N):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


def test_identical_snippet_scores_one():
    q = _noise(0)
    scores, lags = snippet_match_scores_np([q], q)
    assert scores[0] == pytest.approx(1.0, abs=1e-4)
    assert lags[0] == 0


def test_shift_gain_phase_invariance():
    q = _noise(1)
    shifted = np.roll(q, 37) * 3.0 * np.exp(1j * 1.2)
    scores, lags = snippet_match_scores_np([shifted], q)
    assert scores[0] == pytest.approx(1.0, abs=1e-4)
    assert lags[0] == 37


def test_negative_lag_convention():
    q = _noise(2)
    scores, lags = snippet_match_scores_np([np.roll(q, -9)], q)
    assert scores[0] == pytest.approx(1.0, abs=1e-4)
    assert lags[0] == -9


def test_unrelated_noise_scores_low():
    scores, _ = snippet_match_scores_np([_noise(3)], _noise(4))
    assert scores[0] < 0.35


def test_batch_ranking():
    q = _noise(5)
    hist = [
        _noise(6),                      # unrelated
        np.roll(q, 10),                 # perfect
        (q + 2.0 * _noise(7)),          # partial
    ]
    scores, _ = snippet_match_scores_np(hist, q)
    assert scores[1] > scores[2] > scores[0]
    assert scores[1] > 0.99


def test_buoy_match_signal_pattern():
    from radio_mapper_tpu.runtime.buoy import BuoyNode, BuoyNodeConfig

    node = BuoyNode(BuoyNodeConfig(buoy_id="m0", development_mode=True))
    q = _noise(8)
    # Seed history: two detections sharing a stored block snippet, one
    # unrelated.
    from radio_mapper_tpu.runtime.datamodel import SignalDetection
    import datetime

    now = datetime.datetime.now(datetime.timezone.utc).isoformat()

    def det(f):
        return SignalDetection(
            buoy_id="m0", frequency_mhz=f, signal_strength_dbm=-50.0,
            timestamp_utc=now, gps_timestamp_ns=0, lat=0.0, lng=0.0,
            confidence=0.9, signal_type="unknown",
        )

    d1, d2, d3 = det(121.5), det(121.5), det(156.8)
    for d, s in [(d1, np.roll(q, 5)), (d2, _noise(9)), (d3, q)]:
        node.signal_history.append(d)
        node.snippet_history.append((d, s))

    ranked = node.match_signal_pattern(q, min_score=0.5)
    assert [r[0] is x for r, x in zip(ranked, [d3, d1])]
    assert ranked[0][1] == pytest.approx(1.0, abs=1e-4)
    assert len(ranked) == 2  # the noise snippet is filtered out

    # Frequency gate composes with waveform match.
    only_156 = node.match_signal_pattern(q, frequency_mhz=156.8)
    assert len(only_156) == 1 and only_156[0][0] is d3
