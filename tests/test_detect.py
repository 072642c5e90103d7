"""Detector parity tests against the reference semantics and scipy."""

import numpy as np
import jax.numpy as jnp
import scipy.signal

from radio_mapper_tpu.ops import detect, spectral


FS = 2_048_000.0
N = 16_384


def _make_iq(tone_hz, amps, noise_db=-40.0, seed=0, n=N):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    iq = np.zeros(n, dtype=np.complex128)
    for f, a in zip(tone_hz, amps):
        iq += a * np.exp(2j * np.pi * f * t)
    noise_amp = 10 ** (noise_db / 20)
    iq += noise_amp * (rng.normal(size=n) + 1j * rng.normal(size=n)) / np.sqrt(2)
    return iq


def test_power_spectrum_matches_reference_formula():
    iq = _make_iq([100e3], [1.0])
    got = np.asarray(spectral.power_spectrum_db(jnp.asarray(iq, jnp.complex64)))
    want = 20 * np.log10(np.abs(np.fft.fft(iq)) + 1e-12)
    # fp32 FFT vs fp64 FFT: agreement well under 0.1 dB in the signal range
    mask = want > -20
    np.testing.assert_allclose(got[mask], want[mask], atol=0.1)


def test_detects_injected_tones():
    # Two tones well above the noise floor, away from DC.
    tones = [250e3, -400e3]
    iq = _make_iq(tones, [200.0, 120.0])  # raw-count scale like uint8 decode
    peaks = detect.detect_signals(
        jnp.asarray(iq, jnp.complex64), sample_rate_hz=FS, max_peaks=8
    )
    valid = np.asarray(peaks.valid)
    freqs = np.asarray(peaks.freq_offset_hz)[valid]
    assert valid.sum() >= 2
    bin_hz = FS / N
    for tone in tones:
        assert np.min(np.abs(freqs - tone)) < bin_hz * 1.5, (tone, freqs)
    # Sorted by power: strongest tone first.
    assert abs(freqs[0] - 250e3) < bin_hz * 1.5


def test_dc_notch_skips_center():
    # A huge DC spike must be ignored (`buoy_node.py:423`).
    iq = _make_iq([0.0, 5_000.0], [500.0, 300.0])
    peaks = detect.detect_signals(jnp.asarray(iq, jnp.complex64), sample_rate_hz=FS)
    freqs = np.asarray(peaks.freq_offset_hz)[np.asarray(peaks.valid)]
    assert np.all(np.abs(freqs) >= 10_000.0)


def test_threshold_rejects_weak():
    # Tone peak = 20·log10(N·amp) ≈ −76 dB and noise spectrum ≈ −98 dB:
    # everything sits below the −70 "dBm" threshold, so nothing may fire.
    iq = _make_iq([300e3], [1e-8], noise_db=-140.0)
    peaks = detect.detect_signals(jnp.asarray(iq, jnp.complex64), sample_rate_hz=FS)
    assert not np.any(np.asarray(peaks.valid))


def test_confidence_matches_reference_formula():
    iq = _make_iq([250e3], [150.0])
    p_db = np.asarray(spectral.power_spectrum_db(jnp.asarray(iq, jnp.complex64)))
    peaks = detect.detect_peaks(jnp.asarray(p_db), sample_rate_hz=FS)
    valid = np.asarray(peaks.valid)
    assert valid.any()
    k = np.asarray(peaks.bin_index)[valid][0]
    noise_floor = np.median(p_db)
    snr = p_db[k] - noise_floor
    want_conf = min(max(snr / 20.0, 0.0), 1.0)
    got_conf = np.asarray(peaks.confidence)[valid][0]
    np.testing.assert_allclose(got_conf, want_conf, atol=1e-3)


def test_agrees_with_scipy_find_peaks_on_separated_tones():
    tones = [180e3, -300e3, 620e3]
    iq = _make_iq(tones, [220.0, 160.0, 100.0], seed=3)
    p_db = 20 * np.log10(np.abs(np.fft.fft(iq)) + 1e-12)
    ref_peaks, _ = scipy.signal.find_peaks(p_db, height=-70, distance=10)
    # Apply the reference's DC notch and confidence gates.
    freqs = np.fft.fftfreq(N, 1 / FS)
    floor = np.median(p_db)
    ref_peaks = [
        k
        for k in ref_peaks
        if abs(freqs[k]) >= 10e3 and (p_db[k] - floor) / 20.0 >= 0.3
    ]
    ref_set = {int(k) for k in ref_peaks}

    ours = detect.detect_peaks(
        jnp.asarray(p_db, jnp.float32), sample_rate_hz=FS, max_peaks=16
    )
    got_set = {int(k) for k in np.asarray(ours.bin_index)[np.asarray(ours.valid)]}
    # Every strong scipy peak (3 injected tones) must be found by our kernel.
    for tone in tones:
        k_tone = int(np.argmin(np.abs(freqs - tone)))
        near_ref = any(abs(k - k_tone) <= 2 for k in ref_set)
        near_ours = any(abs(k - k_tone) <= 2 for k in got_set)
        assert near_ref and near_ours, (tone, ref_set, got_set)


def test_batched_detection_shapes():
    iq = np.stack([_make_iq([100e3 * (i + 1)], [100.0], seed=i, n=4096) for i in range(6)])
    iq = iq.reshape(2, 3, 4096)
    peaks = detect.detect_signals(jnp.asarray(iq, jnp.complex64), sample_rate_hz=FS, max_peaks=4)
    assert peaks.power_db.shape == (2, 3, 4)
    assert peaks.noise_floor_db.shape == (2, 3)


def test_bandwidth_estimate():
    # Band-limited noise signal ~50 kHz wide.
    rng = np.random.default_rng(7)
    n = N
    f = np.fft.fftfreq(n, 1 / FS)
    center = 200e3
    mask = np.abs(f - center) <= 25e3
    spec = (rng.normal(size=n) + 1j * rng.normal(size=n)) * mask
    iq = np.fft.ifft(spec) * 5e3
    p_db = np.asarray(spectral.power_spectrum_db(jnp.asarray(iq, jnp.complex64)))
    k = int(np.argmin(np.abs(f - center)))
    bw = np.asarray(
        spectral.estimate_bandwidth_hz(
            jnp.asarray(p_db), jnp.asarray(k), FS, max_halfwidth_bins=1024,
            smooth_bins=33,
        )
    )
    assert 25e3 < bw < 100e3, bw


def test_peak_fields_match_explicit_gathers():
    """The gather-free peak fields (snr/conf/freq from top-k values and
    arithmetic on indices) equal what explicit take_along_axis over the
    full per-bin arrays would return, in both safe modes."""
    from radio_mapper_tpu.ops import safe

    iq = _make_iq([150e3, -400e3, 620e3], [0.5, 0.2, 0.1], seed=3)
    p = np.asarray(spectral.power_spectrum_db(jnp.asarray(iq, jnp.complex64)))
    f = p.shape[-1]
    freqs = spectral.fft_frequencies_hz(f, FS)
    for mode in (False, True):
        safe.set_safe_mode(mode)
        try:
            peaks = detect.detect_peaks(jnp.asarray(p), sample_rate_hz=FS)
        finally:
            safe.set_safe_mode(None)
        idx = np.asarray(peaks.bin_index)
        valid = np.asarray(peaks.valid)
        floor = float(np.asarray(peaks.noise_floor_db))
        want_snr = p[idx] - floor
        want_conf = np.clip(want_snr / 20.0, 0.0, 1.0)
        want_freq = freqs[idx].astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(peaks.snr_db)[valid], want_snr[valid], atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(peaks.confidence)[valid], want_conf[valid], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(peaks.freq_offset_hz)[valid], want_freq[valid], rtol=1e-6
        )


def test_noise_floor_stride_close_to_exact():
    iq = _make_iq([150e3], [0.5], seed=4)
    p = jnp.asarray(
        np.asarray(spectral.power_spectrum_db(jnp.asarray(iq, jnp.complex64)))
    )
    exact = detect.detect_peaks(p, sample_rate_hz=FS)
    strided = detect.detect_peaks(p, sample_rate_hz=FS, noise_floor_stride=8)
    assert abs(
        float(np.asarray(exact.noise_floor_db))
        - float(np.asarray(strided.noise_floor_db))
    ) < 0.2
    assert np.array_equal(np.asarray(exact.bin_index), np.asarray(strided.bin_index))
