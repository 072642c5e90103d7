"""Fused GCC pair stage vs float64 golden models (interpret mode on CPU).

Covers the CT-order (digit-permuted) kernel pair that unlocks fusion for
lane-misaligned FFT lengths (n2 not a multiple of 128): forward bin
permutation correctness, the fused whiten→iFFT→lag-window against numpy,
and end-to-end lag parity between the fused and matmul GCC paths.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from radio_mapper_tpu.ops import split_complex as sc_ops
from radio_mapper_tpu.ops.gcc_phat import pair_indices
from radio_mapper_tpu.ops.pallas import fft_kernel, gcc_kernel


@pytest.mark.parametrize("n", [1024, 2176])  # 128·8 and 128·17 (odd n2)
def test_fft_rows_ct_is_permuted_dft(n):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
    fr, fi = fft_kernel.fft_rows_ct(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        interpret=True,
    )
    got = np.asarray(fr) + 1j * np.asarray(fi)
    want = np.fft.fft(x)[:, fft_kernel.ct_permutation(n)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2 * np.abs(want).max())


def test_ct_split_prefers_balanced_lane_aligned():
    assert fft_kernel.ct_split(16384) == (128, 128)
    # sublane-aligned n2 (multiple of 8) wins over a smaller-sum split
    assert fft_kernel.ct_split(16896)[1] % 8 == 0 or fft_kernel.ct_split(16896) == (128, 132)
    n1, n2 = fft_kernel.ct_split(17408)
    assert n1 % 128 == 0 and n2 % 8 == 0 and n1 * n2 == 17408
    with pytest.raises(ValueError):
        fft_kernel.ct_split(2250)  # no factor that is a multiple of 128
    # planner emits fully tile-aligned lengths (multiples of 1024)
    assert gcc_kernel.plan_nfft(16896) == 17408
    n = gcc_kernel.plan_nfft(16384 + 512)
    assert n % 1024 == 0 and fft_kernel.ct_split(n)[1] % 8 == 0


def test_ct_unpermute_recovers_natural_order():
    n = 2176
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, n)) + 1j * rng.normal(size=(2, 3, n))
    fr, fi = fft_kernel.fft_rows_ct(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        interpret=True,
    )
    nat = np.asarray(fft_kernel.ct_unpermute(fr)) + 1j * np.asarray(
        fft_kernel.ct_unpermute(fi)
    )
    want = np.fft.fft(x)
    np.testing.assert_allclose(nat, want, rtol=1e-3, atol=1e-2 * np.abs(want).max())


def test_ct_power_db_matches_padded_fft_power():
    """Detection spectrum derived from CT spectra == zero-padded FFT power
    in natural bin order (tone peak height preserved by padding)."""
    n, max_lag = 4096, 256
    fs = 2.048e6
    t = np.arange(n) / fs
    tone = 0.5 * np.exp(2j * np.pi * 250e3 * t)
    rng = np.random.default_rng(4)
    x = (tone + 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n)))[None, :]
    fr, fi, nfft = sc_ops.receiver_spectra_ct(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        max_lag=max_lag,
    )
    got = np.asarray(sc_ops.ct_power_db(fr, fi))
    xp = np.pad(x, [(0, 0), (0, nfft - n)])
    want = 10 * np.log10(np.abs(np.fft.fft(xp)) ** 2 + 1e-24)
    assert got.shape == want.shape
    # dB tolerance loose in the noise floor, tight at the peak.
    assert abs(got.max() - want.max()) < 0.1
    assert np.argmax(got[0]) == np.argmax(want[0])
    # Peak height ≈ the UNPADDED transform's too (zero-padding preserves it).
    want_unpadded = 10 * np.log10(np.abs(np.fft.fft(x)) ** 2 + 1e-24)
    assert abs(got.max() - want_unpadded.max()) < 0.2


def test_kernel_dot_bf16x3_accuracy():
    """The 3-pass bf16 dot stays ~1e-5 relative of a float64 matmul —
    the explicit form of XLA Precision.HIGH, CPU-verifiable."""
    rng = np.random.default_rng(5)
    a = rng.normal(size=(64, 256)).astype(np.float32)
    b = rng.normal(size=(256, 128)).astype(np.float32)
    dn = (((1,), (0,)), ((), ()))
    got = np.asarray(fft_kernel._dot_bf16x3(jnp.asarray(a), jnp.asarray(b), dn))
    want = a.astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 5e-5, rel


def _golden_window(x, max_lag, eps, weighting="phat"):
    """float64 whiten+ifft+window at the signals' own length (no pad).

    Mirrors the ACTIVE gate algebra (`gcc_kernel._PHAT_GATE`): this is
    the numpy spec of OUR op, so it follows the op's documented formula
    — l2 soft floor by default since r4 (probe ab_gate_r4: τ parity
    7.6e-4 samples vs l1, 5% faster step)."""
    nfft = x.shape[-1]
    spec = np.fft.fft(x)
    i_idx, j_idx = pair_indices(x.shape[0])
    out = []
    for i, j in zip(i_idx, j_idx):
        r = spec[i] * np.conj(spec[j])
        if weighting == "phat":
            p2 = np.abs(r) ** 2
            # "l2rx" without row_smax (this call path) degrades to l2
            if gcc_kernel._PHAT_GATE in ("l2", "l2rx"):
                r = r / np.sqrt(p2 + eps * eps * p2.max() + 1e-30)
            else:
                mag = np.sqrt(p2)
                r = r / (mag + eps * mag.max() + 1e-30)
        corr = np.fft.ifft(r)
        out.append(np.abs(np.concatenate([corr[nfft - max_lag :], corr[: max_lag + 1]])))
    return np.stack(out)


@pytest.mark.parametrize("weighting", ["phat", "cc"])
def test_fused_pair_stage_matches_numpy(weighting):
    n, b, max_lag = 2176, 4, 192
    rng = np.random.default_rng(1)
    x = rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))
    fr, fi = fft_kernel.fft_rows_ct(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        interpret=True,
    )
    i_idx, j_idx = pair_indices(b)
    mags = np.asarray(
        gcc_kernel.gcc_pair_lag_mags(
            fr, fi, i_idx, j_idx, max_lag=max_lag, eps=0.05,
            weighting=weighting, interpret=True,
        )
    )
    want = _golden_window(x, max_lag, 0.05, weighting)
    assert mags.shape == want.shape
    np.testing.assert_allclose(mags, want, rtol=1e-3, atol=1e-3 * want.max())


def test_fused_pair_stage_batched_and_chunked():
    """Leading batch dims and pair chunking smaller than P."""
    n, b, max_lag = 1024, 5, 100  # P = 10 → chunks of 4, 4, 2
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, b, n)) + 1j * rng.normal(size=(2, b, n))
    fr, fi = fft_kernel.fft_rows_ct(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        interpret=True,
    )
    i_idx, j_idx = pair_indices(b)
    mags = np.asarray(
        gcc_kernel.gcc_pair_lag_mags(
            fr, fi, i_idx, j_idx, max_lag=max_lag, eps=0.05,
            pair_chunk=4, interpret=True,
        )
    )
    assert mags.shape == (2, 10, 2 * max_lag + 1)
    for c in range(2):
        want = _golden_window(x[c], max_lag, 0.05)
        np.testing.assert_allclose(mags[c], want, rtol=1e-3, atol=1e-3 * want.max())


def test_fused_gcc_lag_parity_with_matmul_path():
    """End-to-end: fused path recovers the same sub-sample lags as the
    matmul path on a synthetic delayed pair set (different FFT padding,
    same physics)."""
    from radio_mapper_tpu import sim

    # Wideband emitter: correlation lobe ~4 samples, so sub-sample peaks
    # are actually resolvable at this short block length.
    scen = sim.default_scenario(
        block_len=4096, snr_db=25.0, seed=7, bandwidth_hz=500e3
    )
    cap = sim.synthesize(scen)
    re = jnp.asarray(cap.iq.real, jnp.float32)
    im = jnp.asarray(cap.iq.imag, jnp.float32)
    kw = dict(sample_rate_hz=scen.sample_rate_hz, max_lag=256)

    ref = sc_ops.gcc_phat_all_pairs_split(re, im, **kw)
    sc_ops.set_gcc_fused("on")
    try:
        fused = sc_ops.gcc_phat_all_pairs_split_fused(re, im, **kw)
    finally:
        sc_ops.set_gcc_fused("auto")
    np.testing.assert_allclose(
        np.asarray(fused.lag_samples), np.asarray(ref.lag_samples), atol=0.05
    )
    # Ground truth: true pair lags within 0.1 sample (BASELINE bound).
    i_idx, j_idx = pair_indices(len(scen.buoys))
    true = np.array(
        [cap.true_pair_lag_samples(i, j) for i, j in zip(i_idx, j_idx)]
    )
    np.testing.assert_allclose(np.asarray(fused.lag_samples), true, atol=0.1)


def test_pipeline_step_split_fused_matches_unfused():
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu import sim

    scen = sim.default_scenario(
        block_len=4096, snr_db=25.0, seed=9, bandwidth_hz=500e3
    )
    cap = sim.synthesize(scen)
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=4, block_len=4096, sample_rate_hz=scen.sample_rate_hz,
            max_lag=256, power_offset_db=40.0, solver_iterations=25,
        )
    )
    re = jnp.asarray(cap.iq.real, jnp.float32)
    im = jnp.asarray(cap.iq.imag, jnp.float32)
    anchors = jnp.asarray(cap.buoy_enu, jnp.float32)
    base = pipe.step_split(re, im, anchors)
    sc_ops.set_gcc_fused("on")
    try:
        fused = pipe.step_split(re, im, anchors)
    finally:
        sc_ops.set_gcc_fused("auto")
    np.testing.assert_allclose(
        np.asarray(fused.correlation.lag_samples),
        np.asarray(base.correlation.lag_samples),
        atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(fused.fix.position_enu),
        np.asarray(base.fix.position_enu),
        atol=5.0,
    )
    # Detection parity: the fused path's detector runs on the shared
    # CT-spectra power (padded nfft bins) instead of its own N-point FFT.
    # A wideband emitter's PSD is a plateau, so the exact winning bin is
    # not stable between the two resolutions — assert instead that both
    # paths detect, and that every fused top peak lands inside the
    # emitter's occupied band (±bw/2) like the unfused one.
    df = scen.sample_rate_hz / 4096
    assert np.array_equal(
        np.asarray(fused.peaks.valid[..., 0]), np.asarray(base.peaks.valid[..., 0])
    )
    half_bw = scen.emitters[0].bandwidth_hz / 2 + df
    for f_hz in np.asarray(fused.peaks.freq_offset_hz[..., 0]).ravel():
        assert abs(f_hz) <= half_bw, f_hz


def test_l2_phat_gate_tau_parity():
    """The l2 soft-floor whitening (one rsqrt, no reciprocal) must keep
    signal-scene lags within a small fraction of a sample of the l1
    reference form — it only reshapes the response AT the eps knee,
    which signal bins sit far above."""
    import numpy as np

    from radio_mapper_tpu import sim
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops.pallas import gcc_kernel

    scen = sim.default_scenario(signal="noise", bandwidth_hz=150e3, snr_db=20.0, seed=4)
    cap = sim.synthesize(scen)
    re = np.real(cap.iq).astype(np.float32)
    im = np.imag(cap.iq).astype(np.float32)
    sc_ops.set_gcc_fused("on")
    prior_gate = gcc_kernel._PHAT_GATE  # restore the MODULE DEFAULT (l2)
    try:
        outs = {}
        for gate in ("l1", "l2"):
            gcc_kernel.set_phat_gate(gate)
            outs[gate] = sc_ops.gcc_phat_all_pairs_split_fused(
                re, im, sample_rate_hz=scen.sample_rate_hz, max_lag=600,
            )
    finally:
        gcc_kernel.set_phat_gate(prior_gate)
        sc_ops.set_gcc_fused("auto")
    d = np.abs(
        np.asarray(outs["l1"].lag_samples) - np.asarray(outs["l2"].lag_samples)
    ).max()
    assert d < 0.05, d  # sub-sample refine stays within the 0.1-sample budget


def test_onehot_pairs_kernel_matches_rows_kernel():
    """In-kernel one-hot gather (spectra resident, no [P, nfft]
    materialization) vs explicit gather + rows kernel: same windows at
    HIGHEST gather precision, traced OR static pair indices."""
    n, b, max_lag = 2048, 12, 100
    rng = np.random.default_rng(7)
    x = rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))
    fr, fi = fft_kernel.fft_rows_ct(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        interpret=True,
    )
    i_idx, j_idx = pair_indices(b)  # P = 66 → chunks of 32, 32, 8(pad)
    gather = lambda a, k: jnp.take(a, jnp.asarray(k), axis=-2)
    want = np.asarray(gcc_kernel.gcc_rows_lag_mags(
        gather(fr, i_idx), gather(fi, i_idx),
        gather(fr, j_idx), gather(fi, j_idx),
        max_lag=max_lag, interpret=True,
    ))
    got = np.asarray(gcc_kernel.gcc_pairs_onehot_lag_mags(
        fr, fi, jnp.asarray(i_idx), jnp.asarray(j_idx),
        max_lag=max_lag, interpret=True,
    ))
    assert got.shape == want.shape == (66, 2 * max_lag + 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    # traced indices (the EP case) — same result under jit
    import jax

    got_traced = np.asarray(jax.jit(
        lambda a, bb, ii, jj: gcc_kernel.gcc_pairs_onehot_lag_mags(
            a, bb, ii, jj, max_lag=max_lag, interpret=True
        )
    )(fr, fi, jnp.asarray(i_idx), jnp.asarray(j_idx)))
    np.testing.assert_allclose(got_traced, got, rtol=1e-6, atol=1e-7)
    # s2-gated variant stays close to the reduction form
    rmax = np.asarray(fr) ** 2 + np.asarray(fi) ** 2
    rmax = rmax.max(axis=-1)
    s2 = jnp.asarray(rmax[i_idx] * rmax[j_idx])
    prior = gcc_kernel._PHAT_GATE
    try:
        gcc_kernel.set_phat_gate("l2rx")
        got_s2 = np.asarray(gcc_kernel.gcc_pairs_onehot_lag_mags(
            fr, fi, jnp.asarray(i_idx), jnp.asarray(j_idx),
            max_lag=max_lag, interpret=True, s2=s2,
        ))
    finally:
        gcc_kernel.set_phat_gate(prior)
    assert np.abs(got_s2 - want).max() / want.max() < 0.25
