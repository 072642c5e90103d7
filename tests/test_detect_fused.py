"""Fused CT detect kernel vs the reference detect path (interpret mode).

The contract (VERDICT r3 item 1): `detect_peaks_ct` must reproduce
`detect_peaks(ct_power_db(fr, fi) + offset, ...)` under safe mode —
same candidates, same top-K peaks, bit-identical noise floor — while
never materializing the natural-order power array.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radio_mapper_tpu.ops import detect as detect_ops
from radio_mapper_tpu.ops import safe
from radio_mapper_tpu.ops import split_complex as sc_ops
from radio_mapper_tpu.ops.pallas import detect_kernel, fft_kernel

NFFT = 2048  # ct_split → n1=128, n2=16 (n2 % 8 == 0)


def _ct_spectra(batch, seed=0, tones=()):
    """Random CT-order spectra with optional injected natural-bin tones."""
    rng = np.random.default_rng(seed)
    n = NFFT
    re = rng.normal(scale=0.1, size=(*batch, n)).astype(np.float32)
    im = rng.normal(scale=0.1, size=(*batch, n)).astype(np.float32)
    t = np.arange(n)
    for bin_idx, amp in tones:
        re += (amp * np.cos(2 * np.pi * bin_idx * t / n)).astype(np.float32)
        im += (amp * np.sin(2 * np.pi * bin_idx * t / n)).astype(np.float32)
    return fft_kernel.fft_rows_ct(jnp.asarray(re), jnp.asarray(im))


def _reference_peaks(fr, fi, **kw):
    """The existing (unfused) fused-GCC-path detect: un-permute + detect
    with SAFE-mode semantics (what the TPU step traced before r4)."""
    offset = kw.pop("power_offset_db", 0.0)
    power_db = sc_ops.ct_power_db(fr, fi) + offset
    safe.set_safe_mode(True)
    try:
        return detect_ops.detect_peaks(
            power_db, noise_floor_stride=8, **kw
        )
    finally:
        safe.set_safe_mode(None)


def _fused_peaks(fr, fi, **kw):
    safe.set_safe_mode(True)  # match top-k tie-break semantics
    try:
        return detect_ops.detect_peaks_ct(fr, fi, **kw)
    finally:
        safe.set_safe_mode(None)


def _assert_peaks_equal(ref, got, *, check_values=True):
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(ref.bin_index)[v], np.asarray(got.bin_index)[v]
    )
    if check_values:
        for field in ("power_db", "snr_db", "confidence", "freq_offset_hz"):
            np.testing.assert_allclose(
                np.asarray(getattr(ref, field))[v],
                np.asarray(getattr(got, field))[v],
                rtol=0, atol=1e-5, err_msg=field,
            )
    np.testing.assert_allclose(
        np.asarray(ref.noise_floor_db), np.asarray(got.noise_floor_db),
        rtol=0, atol=1e-5,
    )


def test_supported_gate():
    assert detect_kernel.supported(NFFT, min_distance_bins=10, noise_floor_stride=8)
    assert not detect_kernel.supported(NFFT, min_distance_bins=10, noise_floor_stride=1)
    assert not detect_kernel.supported(NFFT, min_distance_bins=5, noise_floor_stride=8)
    assert not detect_kernel.supported(1000, min_distance_bins=10, noise_floor_stride=8)


def test_noise_floor_matches():
    """Same subsample multiset + reorder-invariant bisect ⇒ the noise
    floor matches to the fma-rounding ulp of the power computation (the
    only nondeterminism left between eager XLA and the kernel)."""
    fr, fi = _ct_spectra((3, 2), seed=1)
    kw = dict(sample_rate_hz=2.4e6, max_peaks=8, threshold_db=-200.0)
    ref = _reference_peaks(fr, fi, **kw)
    got = _fused_peaks(fr, fi, **kw)
    np.testing.assert_allclose(
        np.asarray(ref.noise_floor_db), np.asarray(got.noise_floor_db),
        rtol=0, atol=1e-5,
    )


@pytest.mark.parametrize("seed", [0, 7])
def test_tones_match_reference(seed):
    tones = [(200, 3.0), (213, 2.0), (700, 1.0), (NFFT - 300, 1.5)]
    fr, fi = _ct_spectra((2,), seed=seed, tones=tones)
    kw = dict(sample_rate_hz=2.4e6, max_peaks=8, threshold_db=-20.0)
    ref = _reference_peaks(fr, fi, **kw)
    got = _fused_peaks(fr, fi, **kw)
    _assert_peaks_equal(ref, got)
    # the injected, spacing-separated tones must all be found
    found = set(np.asarray(got.bin_index)[0][np.asarray(got.valid)[0]])
    assert {200, 213, 700, NFFT - 300} <= found


def test_noise_only_threshold_matches():
    """Near-threshold noise: candidate gates agree between the dB-domain
    reference and the linear-domain kernel."""
    fr, fi = _ct_spectra((4,), seed=3)
    kw = dict(sample_rate_hz=2.4e6, max_peaks=8, threshold_db=18.0)
    ref = _reference_peaks(fr, fi, **kw)
    got = _fused_peaks(fr, fi, **kw)
    _assert_peaks_equal(ref, got)


def test_power_offset_and_conf_floor():
    tones = [(150, 2.0), (400, 0.45)]
    fr, fi = _ct_spectra((1,), seed=4, tones=tones)
    for off in (0.0, 42.1):
        for floor in (0.0, 0.3, 0.9):
            kw = dict(
                sample_rate_hz=2.4e6, max_peaks=4, threshold_db=-10.0 + off,
                confidence_floor=floor, power_offset_db=off,
            )
            ref = _reference_peaks(fr, fi, **kw)
            got = _fused_peaks(fr, fi, **kw)
            _assert_peaks_equal(ref, got)


def test_conf_floor_above_one_empty():
    fr, fi = _ct_spectra((2,), seed=5, tones=[(300, 5.0)])
    got = _fused_peaks(
        fr, fi, sample_rate_hz=2.4e6, threshold_db=-50.0, confidence_floor=1.5
    )
    assert not np.asarray(got.valid).any()


def test_dc_notch_excludes_center():
    """A strong tone inside the ±notch region must not be reported."""
    fs = 2.4e6
    notch_bins = int(10_000.0 / (fs / NFFT))  # bins inside the notch
    tones = [(2, 5.0), (notch_bins + 40, 3.0), (NFFT - 3, 4.0)]
    fr, fi = _ct_spectra((1,), seed=6, tones=tones)
    kw = dict(sample_rate_hz=fs, max_peaks=8, threshold_db=-10.0)
    ref = _reference_peaks(fr, fi, **kw)
    got = _fused_peaks(fr, fi, **kw)
    _assert_peaks_equal(ref, got)
    found = set(np.asarray(got.bin_index)[0][np.asarray(got.valid)[0]])
    assert 2 not in found and NFFT - 3 not in found
    assert notch_bins + 40 in found


def test_notch_keep_range_matches_mask():
    for fs, notch in ((2.4e6, 10_000.0), (2.048e6, 25_000.0)):
        freqs = np.fft.fftfreq(NFFT, d=1.0 / fs)
        mask = np.abs(freqs) >= notch
        lo, hi = detect_kernel.notch_keep_range(NFFT, fs, notch)
        k = np.arange(NFFT)
        np.testing.assert_array_equal(mask, (k >= lo) & (k <= hi))
    assert detect_kernel.notch_keep_range(NFFT, 2.4e6, None) == (0, NFFT - 1)


def test_pipeline_routing_equivalence():
    """step_split with the fused detect forced on vs off: same peaks and
    the same fix (the GCC stage is identical in both tracings)."""
    from radio_mapper_tpu import sim
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline

    scen = sim.default_scenario(
        signal="noise", bandwidth_hz=150e3, snr_db=25.0, seed=11
    )
    cap = sim.synthesize(scen)
    cfg = PipelineConfig(
        num_buoys=4, block_len=scen.block_len,
        sample_rate_hz=scen.sample_rate_hz, max_lag=600,
        power_offset_db=40.0, solver_iterations=25,
    )
    pipe = TDOAPipeline(cfg)
    re = np.real(cap.iq).astype(np.float32)
    im = np.imag(cap.iq).astype(np.float32)
    anchors = np.asarray(cap.buoy_enu, np.float32)
    from radio_mapper_tpu.ops.pallas import gcc_kernel

    sc_ops.set_gcc_fused("on")
    safe.set_safe_mode(True)
    # Pin the l2 gate: with the default l2rx, the fused-on routing feeds
    # the pair stage per-receiver gate scales (row_smax) that the
    # fused-off routing cannot, so the GCC stages would no longer be
    # identical tracings (the l2↔l2rx deviation has its own parity
    # tests in test_fft_detect_fused.py).
    prior_gate = gcc_kernel._PHAT_GATE
    gcc_kernel.set_phat_gate("l2")
    try:
        detect_ops.set_fused_detect("on")
        out_fused = pipe.step_split(re, im, anchors)
        detect_ops.set_fused_detect("off")
        out_plain = pipe.step_split(re, im, anchors)
    finally:
        gcc_kernel.set_phat_gate(prior_gate)
        detect_ops.set_fused_detect("auto")
        sc_ops.set_gcc_fused("auto")
        safe.set_safe_mode(None)
    _assert_peaks_equal(out_plain.peaks, out_fused.peaks)
    np.testing.assert_allclose(
        np.asarray(out_plain.fix.position_enu),
        np.asarray(out_fused.fix.position_enu),
        rtol=0, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_plain.pair_weights),
        np.asarray(out_fused.pair_weights),
        rtol=0, atol=1e-5,
    )


def test_kernel_topk_matches_twostage():
    """In-kernel top-K (emit_topk) vs the two-stage partials+XLA path:
    identical peaks, offsets, noise floor."""
    tones = [(100, 4.0), (180, 3.0), (777, 2.0), (NFFT - 64, 1.2)]
    fr, fi = _ct_spectra((3,), seed=9, tones=tones)
    kw = dict(sample_rate_hz=2.4e6, max_peaks=6, threshold_db=-15.0)
    safe.set_safe_mode(True)
    try:
        a = detect_ops.detect_peaks_ct(fr, fi, kernel_topk=True, **kw)
        b = detect_ops.detect_peaks_ct(fr, fi, kernel_topk=False, **kw)
    finally:
        safe.set_safe_mode(None)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    v = np.asarray(a.valid)
    np.testing.assert_array_equal(
        np.asarray(a.bin_index)[v], np.asarray(b.bin_index)[v]
    )
    np.testing.assert_array_equal(
        np.asarray(a.power_db)[v], np.asarray(b.power_db)[v]
    )
    np.testing.assert_array_equal(
        np.asarray(a.noise_floor_db), np.asarray(b.noise_floor_db)
    )


def test_kernel_topk_against_reference_path():
    """The default (in-kernel top-K) routing still matches the r3 XLA
    detect stage end to end."""
    tones = [(300, 3.0), (500, 2.5)]
    fr, fi = _ct_spectra((2,), seed=10, tones=tones)
    kw = dict(sample_rate_hz=2.4e6, max_peaks=8, threshold_db=-18.0)
    ref = _reference_peaks(fr, fi, **kw)
    got = _fused_peaks(fr, fi, **kw)  # kernel_topk defaults True
    _assert_peaks_equal(ref, got)
