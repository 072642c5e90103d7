"""Combined FFT+detect kernel (r5): exact equality with the two-kernel
form, per-receiver gate parity, and end-to-end pipeline equivalence.

The combined kernel (`detect_kernel.fft_detect_rows_ct`) must produce
bit-identical spectra to `fft_kernel.fft_rows_ct` AND bit-identical
detect partials to `detect_kernel.detect_ct_partials` run on those
spectra — the HBM round-trip it removes was exact (f32 stores), so any
difference is a bug, not tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from radio_mapper_tpu import constants, sim
from radio_mapper_tpu.ops import detect as detect_ops
from radio_mapper_tpu.ops import split_complex as sc_ops
from radio_mapper_tpu.ops.pallas import detect_kernel, fft_kernel, gcc_kernel

DET = dict(
    sample_rate_hz=2_400_000.0,
    threshold_db=-70.0,
    min_distance_bins=constants.DEFAULT_PEAK_MIN_DISTANCE_BINS,
    dc_notch_hz=constants.DEFAULT_DC_NOTCH_HZ,
    confidence_floor=constants.DEFAULT_CONFIDENCE_FLOOR,
    snr_fullscale_db=constants.DEFAULT_SNR_FULLSCALE_DB,
    power_offset_db=42.1,
)


def _rows(batch, nfft, seed=0, scale=40.0):
    rng = np.random.default_rng(seed)
    re = (scale * rng.normal(size=(batch, nfft))).astype(np.float32)
    im = (scale * rng.normal(size=(batch, nfft))).astype(np.float32)
    # plant a few strong tones so candidates actually fire
    t = np.arange(nfft)
    for k, f in enumerate((137, 1031, 4099)):
        re[k % batch] += 400.0 * np.cos(2 * np.pi * f * t / nfft).astype(np.float32)
        im[k % batch] += 400.0 * np.sin(2 * np.pi * f * t / nfft).astype(np.float32)
    return re, im


@pytest.mark.parametrize("nfft", [2048, 9216])
def test_combined_kernel_matches_two_stage_exactly(nfft):
    re, im = _rows(5, nfft, seed=1)
    fr0, fi0 = fft_kernel.fft_rows_ct(re, im, interpret=True)
    s0, a0, nf0 = detect_kernel.detect_ct_partials(fr0, fi0, **DET, interpret=True)

    fr, fi, s, a, nf, rmax = detect_kernel.fft_detect_rows_ct(
        re, im, **DET, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(fr0))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(fi0))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(nf0))
    # row_max is the max linear power of each spectrum row
    p = np.asarray(fr0) ** 2 + np.asarray(fi0) ** 2
    np.testing.assert_allclose(np.asarray(rmax), p.max(axis=-1), rtol=1e-6)


def test_combined_kernel_precision_override_matches():
    """The forward-precision override (PHAT single-pass bf16) must flow
    through the combined kernel identically to fft_rows_ct."""
    re, im = _rows(3, 2048, seed=2)
    fr0, fi0 = fft_kernel.fft_rows_ct(re, im, interpret=True, precision="default")
    fr, fi, *_ = detect_kernel.fft_detect_rows_ct(
        re, im, **DET, interpret=True, precision="default"
    )
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(fr0))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(fi0))


def test_receiver_spectra_ct_detect_matches_separate_calls():
    """The sc_ops wrapper (pad → combined kernel) equals
    receiver_spectra_ct + detect_ct_partials on the same config."""
    rng = np.random.default_rng(3)
    n, max_lag = 4096, 128
    re = rng.normal(size=(2, 4, n)).astype(np.float32)
    im = rng.normal(size=(2, 4, n)).astype(np.float32)
    spec0 = sc_ops.receiver_spectra_ct(re, im, max_lag=max_lag)
    s0, a0, nf0 = detect_kernel.detect_ct_partials(
        spec0[0], spec0[1], **DET, interpret=True
    )
    (fr, fi, nfft), (s, a, nf), rmax = sc_ops.receiver_spectra_ct_detect(
        re, im, max_lag=max_lag, **DET
    )
    assert nfft == spec0[2]
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(spec0[0]))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(spec0[1]))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(nf0))
    assert rmax.shape == (2, 4)


def test_l2rx_gate_tau_parity():
    """The per-receiver-bound gate (l2rx — NO spectral reduction in the
    pair kernel) must keep signal-scene lags within a small fraction of
    a sample of the per-pair l2 form: the bound only tightens the floor
    on already-suppressed bins."""
    scen = sim.default_scenario(signal="noise", bandwidth_hz=150e3, snr_db=20.0, seed=5)
    cap = sim.synthesize(scen)
    re = np.real(cap.iq).astype(np.float32)
    im = np.imag(cap.iq).astype(np.float32)
    spectra = sc_ops.receiver_spectra_ct(re, im, max_lag=600)
    p = np.asarray(spectra[0]) ** 2 + np.asarray(spectra[1]) ** 2
    row_smax = jnp.asarray(p.max(axis=-1))

    sc_ops.set_gcc_fused("on")
    prior_gate = gcc_kernel._PHAT_GATE
    try:
        gcc_kernel.set_phat_gate("l2")
        base = sc_ops.gcc_phat_all_pairs_split_fused(
            re, im, sample_rate_hz=scen.sample_rate_hz, max_lag=600,
            spectra=spectra,
        )
        gcc_kernel.set_phat_gate("l2rx")
        rx = sc_ops.gcc_phat_all_pairs_split_fused(
            re, im, sample_rate_hz=scen.sample_rate_hz, max_lag=600,
            spectra=spectra, row_smax=row_smax,
        )
        # without row_smax the l2rx gate must DEGRADE to l2 (exact match)
        fallback = sc_ops.gcc_phat_all_pairs_split_fused(
            re, im, sample_rate_hz=scen.sample_rate_hz, max_lag=600,
            spectra=spectra,
        )
    finally:
        gcc_kernel.set_phat_gate(prior_gate)
        sc_ops.set_gcc_fused("auto")
    d = np.abs(np.asarray(base.lag_samples) - np.asarray(rx.lag_samples)).max()
    assert d < 0.05, d
    np.testing.assert_array_equal(
        np.asarray(fallback.lag_samples), np.asarray(base.lag_samples)
    )


def test_pipeline_combined_path_matches_two_stage():
    """step_split with the combined FFT+detect kernel forced on equals
    the two-kernel routing EXACTLY (same gate, same spectra values)."""
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline

    scen = sim.default_scenario(signal="noise", bandwidth_hz=100e3, snr_db=15.0, seed=7)
    cap = sim.synthesize(scen)
    re = np.real(cap.iq).astype(np.float32)
    im = np.imag(cap.iq).astype(np.float32)
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=re.shape[0], block_len=re.shape[-1],
            sample_rate_hz=scen.sample_rate_hz, max_lag=256,
            solver_iterations=10,
        )
    )
    anchors = np.asarray(cap.buoy_enu, np.float32)
    sc_ops.set_gcc_fused("on")
    detect_ops.set_fused_detect("on")
    prior_gate = gcc_kernel._PHAT_GATE
    gcc_kernel.set_phat_gate("l2")  # pin: l2rx engages only with row_smax
    try:
        detect_ops.set_fused_fft_detect("off")
        base = pipe.step_split(jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors))
        detect_ops.set_fused_fft_detect("on")
        # fresh callable: jit caches are shared per callable (CLAUDE.md)
        comb = TDOAPipeline(pipe.config).step_split(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)
        )
    finally:
        gcc_kernel.set_phat_gate(prior_gate)
        detect_ops.set_fused_fft_detect("auto")
        detect_ops.set_fused_detect("auto")
        sc_ops.set_gcc_fused("auto")
    np.testing.assert_array_equal(
        np.asarray(base.peaks.bin_index), np.asarray(comb.peaks.bin_index)
    )
    np.testing.assert_array_equal(
        np.asarray(base.peaks.power_db), np.asarray(comb.peaks.power_db)
    )
    # same spectra + same (l2) gate ⇒ identical correlation outputs
    np.testing.assert_array_equal(
        np.asarray(base.correlation.lag_samples),
        np.asarray(comb.correlation.lag_samples),
    )
    np.testing.assert_allclose(
        np.asarray(base.fix.position_enu),
        np.asarray(comb.fix.position_enu),
        atol=1e-3,
    )


def test_rows_kernel_s2_gate_parity():
    """Row-aligned kernel with precomputed l2rx gate scales (s2) vs the
    in-kernel l2 reduction: identical when s2 equals the per-pair max
    (bound tight), close when it overestimates."""
    rng = np.random.default_rng(9)
    p_rows, nfft, L = 24, 2048, 100
    mk = lambda: rng.normal(size=(p_rows, nfft)).astype(np.float32)
    xre, xim, yre, yim = mk(), mk(), mk(), mk()
    prior = gcc_kernel._PHAT_GATE
    try:
        gcc_kernel.set_phat_gate("l2")
        base = np.asarray(gcc_kernel.gcc_rows_lag_mags(
            xre, xim, yre, yim, max_lag=L, interpret=True
        ))
        gcc_kernel.set_phat_gate("l2rx")
        # EXACT s2 (the true per-pair max) must reproduce l2 bitwise-ish
        p2 = (xre * yre + xim * yim) ** 2 + (xim * yre - xre * yim) ** 2
        s2_exact = jnp.asarray(p2.max(axis=-1))
        got = np.asarray(gcc_kernel.gcc_rows_lag_mags(
            xre, xim, yre, yim, max_lag=L, interpret=True, s2=s2_exact
        ))
        np.testing.assert_allclose(got, base, rtol=2e-6, atol=2e-7)
        # the per-receiver BOUND (what callers actually pass) stays close
        rx = (xre ** 2 + xim ** 2).max(axis=-1)
        ry = (yre ** 2 + yim ** 2).max(axis=-1)
        got2 = np.asarray(gcc_kernel.gcc_rows_lag_mags(
            xre, xim, yre, yim, max_lag=L, interpret=True,
            s2=jnp.asarray(rx * ry),
        ))
        # whiten floors differ only near the eps knee. INDEPENDENT noise
        # rows are the bound's worst case (maxima at unrelated bins, the
        # whole flat window near the knee) — measured ~0.18 relative
        # here; correlated signal scenes sit at τ parity ≤ 0.011 samples
        # (test_l2rx_gate_tau_parity, probe ab_r5_fuse).
        assert np.abs(got2 - base).max() / base.max() < 0.25
        # and without s2 the l2rx default falls back to l2 exactly
        got3 = np.asarray(gcc_kernel.gcc_rows_lag_mags(
            xre, xim, yre, yim, max_lag=L, interpret=True
        ))
        np.testing.assert_array_equal(got3, base)
    finally:
        gcc_kernel.set_phat_gate(prior)


def test_combined_kernel_in_kernel_topk_matches():
    """emit_topk in the COMBINED kernel: identical peaks to the two-stage
    partials + XLA top-K tail."""
    re, im = _rows(5, 9216, seed=21)
    fr, fi, s0, a0, nf0, _ = detect_kernel.fft_detect_rows_ct(
        re, im, **DET, interpret=True
    )
    base = detect_ops.peaks_from_ct_partials(
        s0, a0, nf0, nfft=9216,
        sample_rate_hz=DET["sample_rate_hz"], max_peaks=8,
        power_offset_db=DET["power_offset_db"],
    )
    _, _, sv, av, nfv, _ = detect_kernel.fft_detect_rows_ct(
        re, im, **DET, interpret=True, emit_topk=8
    )
    got = detect_ops.peaks_from_ct_partials(
        sv, av, nfv, nfft=9216,
        sample_rate_hz=DET["sample_rate_hz"], max_peaks=8,
        power_offset_db=DET["power_offset_db"], kernel_topk=True,
    )
    for f in ("bin_index", "power_db", "snr_db", "valid", "noise_floor_db"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(base, f)), err_msg=f
        )


def test_pipeline_combined_topk_matches():
    """step_split with in-kernel top-K in the combined routing equals the
    default partials routing exactly."""
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline

    scen = sim.default_scenario(signal="noise", bandwidth_hz=100e3, snr_db=15.0, seed=23)
    cap = sim.synthesize(scen)
    re = np.real(cap.iq).astype(np.float32)
    im = np.imag(cap.iq).astype(np.float32)
    anchors = np.asarray(cap.buoy_enu, np.float32)
    cfg = PipelineConfig(
        num_buoys=re.shape[0], block_len=re.shape[-1],
        sample_rate_hz=scen.sample_rate_hz, max_lag=256, solver_iterations=10,
    )
    sc_ops.set_gcc_fused("on")
    detect_ops.set_fused_detect("on")
    try:
        base = TDOAPipeline(cfg).step_split(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)
        )
        detect_ops.set_combined_topk(True)
        topk = TDOAPipeline(cfg).step_split(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)
        )
    finally:
        detect_ops.set_combined_topk(False)
        detect_ops.set_fused_detect("auto")
        sc_ops.set_gcc_fused("auto")
    np.testing.assert_array_equal(
        np.asarray(base.peaks.bin_index), np.asarray(topk.peaks.bin_index)
    )
    np.testing.assert_array_equal(
        np.asarray(base.correlation.lag_samples),
        np.asarray(topk.correlation.lag_samples),
    )
