"""Flagship megakernel (FFT × detect × GCC in one pass) equality tests.

The megakernel replaces the combined-FFT+detect kernel + pair kernel
composition; every value it emits must EXACTLY equal that composition
(the HBM spectra round-trip it removes was exact f32)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radio_mapper_tpu import constants, sim
from radio_mapper_tpu.ops import detect as detect_ops
from radio_mapper_tpu.ops import split_complex as sc_ops
from radio_mapper_tpu.ops.gcc_phat import pair_indices
from radio_mapper_tpu.ops.pallas import channel_kernel, gcc_kernel

DET = dict(
    sample_rate_hz=2_400_000.0,
    threshold_db=-70.0,
    min_distance_bins=constants.DEFAULT_PEAK_MIN_DISTANCE_BINS,
    dc_notch_hz=constants.DEFAULT_DC_NOTCH_HZ,
    confidence_floor=constants.DEFAULT_CONFIDENCE_FLOOR,
    snr_fullscale_db=constants.DEFAULT_SNR_FULLSCALE_DB,
    power_offset_db=40.0,
)


def test_megakernel_matches_composition():
    rng = np.random.default_rng(11)
    c, b, n, max_lag = 3, 4, 4096, 128
    re = (30 * rng.normal(size=(c, b, n))).astype(np.float32)
    im = (30 * rng.normal(size=(c, b, n))).astype(np.float32)
    i_idx, j_idx = pair_indices(b)

    # composition: combined FFT+detect kernel → pair kernel (l2rx)
    (fr, fi, nfft), (s0, a0, nf0), rmax = sc_ops.receiver_spectra_ct_detect(
        re, im, max_lag=max_lag, **DET, precision="default"
    )
    prior = gcc_kernel._PHAT_GATE
    try:
        gcc_kernel.set_phat_gate("l2rx")
        w0 = np.asarray(gcc_kernel.gcc_pair_lag_mags(
            fr, fi, i_idx, j_idx, max_lag=max_lag, eps=0.05,
            row_smax=rmax, interpret=True,
        ))
        nfft_m, (s, a, nf), window = sc_ops.flagship_channel_step(
            jnp.asarray(re), jnp.asarray(im), i_idx, j_idx,
            max_lag=max_lag, eps=0.05, **DET,
        )
    finally:
        gcc_kernel.set_phat_gate(prior)
    assert nfft_m == nfft
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(nf0))
    np.testing.assert_array_equal(np.asarray(window), w0)
    assert window.shape == (c, len(i_idx), 2 * max_lag + 1)


def test_supported_gates():
    channel_kernel.set_mega_fused("on")
    try:
        assert channel_kernel.supported(
            9216, 8, min_distance_bins=10, noise_floor_stride=8,
            weighting="phat",
        )
        # cc keeps the split kernels (bf16x3 spectra)
        assert not channel_kernel.supported(
            9216, 8, min_distance_bins=10, noise_floor_stride=8,
            weighting="cc",
        )
        # too many receivers per channel for resident-VMEM
        assert not channel_kernel.supported(
            9216, 24, min_distance_bins=10, noise_floor_stride=8,
            weighting="phat",
        )
    finally:
        channel_kernel.set_mega_fused("off")
    # the measured-neutral default keeps the two-kernel routing
    assert not channel_kernel.supported(
        9216, 8, min_distance_bins=10, noise_floor_stride=8, weighting="phat"
    )
    channel_kernel.set_mega_fused("auto")
    try:
        assert not channel_kernel.supported(
            9216, 8, min_distance_bins=10, noise_floor_stride=8,
            weighting="phat",
        )
    finally:
        channel_kernel.set_mega_fused("off")


def test_pipeline_mega_path_localizes():
    """End-to-end: the mega routing produces a sound fix AND identical
    peaks to the combined two-kernel routing on a real scene."""
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline

    scen = sim.default_scenario(signal="noise", bandwidth_hz=150e3, snr_db=20.0, seed=13)
    cap = sim.synthesize(scen)
    re = np.real(cap.iq).astype(np.float32)
    im = np.imag(cap.iq).astype(np.float32)
    anchors = np.asarray(cap.buoy_enu, np.float32)
    cfg = PipelineConfig(
        num_buoys=re.shape[0], block_len=re.shape[-1],
        sample_rate_hz=scen.sample_rate_hz, max_lag=600,
        power_offset_db=40.0, solver_iterations=20,
    )
    sc_ops.set_gcc_fused("on")
    detect_ops.set_fused_detect("on")
    try:
        channel_kernel.set_mega_fused("on")
        mega = TDOAPipeline(cfg).step_split(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)
        )
        channel_kernel.set_mega_fused("off")
        base = TDOAPipeline(cfg).step_split(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)
        )
    finally:
        # restore the SHIPPED defaults ("off" for mega — the measured-
        # neutral megakernel stays opt-in; "auto" for the fused routings)
        channel_kernel.set_mega_fused("off")
        detect_ops.set_fused_detect("auto")
        sc_ops.set_gcc_fused("auto")
    np.testing.assert_array_equal(
        np.asarray(mega.peaks.bin_index), np.asarray(base.peaks.bin_index)
    )
    np.testing.assert_array_equal(
        np.asarray(mega.correlation.lag_samples),
        np.asarray(base.correlation.lag_samples),
    )
    err = np.linalg.norm(
        np.asarray(mega.fix.position_enu)[:2] - cap.emitter_enu[0][:2]
    )
    assert err < 50.0, err
