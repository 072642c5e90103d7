"""Fused Pallas four-step FFT kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radio_mapper_tpu.ops import fft as fft_ops
from radio_mapper_tpu.ops.pallas import fft_kernel


def _rand_c(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


@pytest.mark.parametrize("n", [1024, 4096, 16384, 32768])
def test_fused_fft_matches_numpy(n):
    x = _rand_c((3, n), seed=n)
    got = np.asarray(fft_kernel.fft(jnp.asarray(x)))
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-5, (n, err)


def test_fused_ifft_roundtrip():
    x = _rand_c((2, 4096), seed=1)
    y = np.asarray(fft_kernel.ifft(fft_kernel.fft(jnp.asarray(x))))
    assert np.abs(y - x).max() < 1e-4


def test_batch_padding_to_row_blocks():
    # 5 rows with rows_per_block=8 exercises the pad/slice path.
    x = _rand_c((5, 1024), seed=2)
    got = np.asarray(fft_kernel.fft(jnp.asarray(x), rows_per_block=8))
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_multi_dim_batch():
    x = _rand_c((2, 3, 1024), seed=3)
    got = np.asarray(fft_kernel.fft(jnp.asarray(x)))
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_backend_dispatch():
    fft_ops.set_backend("pallas")
    try:
        x = _rand_c((4, 2048), seed=4)
        got = np.asarray(fft_ops.fft(jnp.asarray(x)))
        want = np.fft.fft(x.astype(np.complex128), axis=-1)
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-5
        got_i = np.asarray(fft_ops.ifft(jnp.asarray(x)))
        want_i = np.fft.ifft(x.astype(np.complex128), axis=-1)
        assert np.abs(got_i - want_i).max() / np.abs(want_i).max() < 2e-5
    finally:
        fft_ops.set_backend("auto")


def test_gcc_phat_on_pallas_backend():
    from radio_mapper_tpu.ops import gcc_phat as gp

    fft_ops.set_backend("pallas")
    try:
        fs = 2_400_000.0
        n = 16_384
        rng = np.random.default_rng(11)
        f = np.fft.fftfreq(n, 1 / fs)
        spec = (rng.normal(size=n) + 1j * rng.normal(size=n)) * (np.abs(f) <= 100e3)
        s = np.fft.ifft(spec)
        s /= np.sqrt(np.mean(np.abs(s) ** 2))
        true_lag = -22.6
        x = np.fft.ifft(np.fft.fft(s) * np.exp(-2j * np.pi * f * true_lag / fs))
        peak = gp.gcc_phat(
            jnp.asarray(x, jnp.complex64), jnp.asarray(s, jnp.complex64),
            sample_rate_hz=fs, max_lag=256,
        )
        assert abs(float(peak.lag_samples) - true_lag) < 0.1
    finally:
        fft_ops.set_backend("auto")


def test_unsupported_length_raises():
    with pytest.raises(ValueError):
        fft_kernel.fft(jnp.zeros((1, 2 * 257 * 521), jnp.complex64))


def test_mosaic_compatibility_predicate():
    # Real-TPU routing: both factors must be lane-aligned (minor dims of
    # the kernel's shape casts stay multiples of 128).
    assert fft_kernel.mosaic_compatible(16384)   # 128*128
    assert fft_kernel.mosaic_compatible(32768)   # 256*128
    assert fft_kernel.mosaic_compatible(65536)   # 256*256
    assert not fft_kernel.mosaic_compatible(17280)  # 128*135 — v5e repro
    assert not fft_kernel.mosaic_compatible(4096)   # 64*64
    assert not fft_kernel.mosaic_compatible(2 * 257 * 521)


def test_auto_route_skips_mosaic_incompatible():
    # In auto mode on TPU, 17280 must take the matmul path; we can only
    # assert the predicate wiring here (CPU), not the backend branch.
    assert not fft_ops._pallas_supported(17280)
    assert fft_ops._pallas_supported(16384)
