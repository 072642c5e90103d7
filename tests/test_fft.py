"""Matmul (four-step) FFT vs. NumPy float64 reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from radio_mapper_tpu.ops import fft as fft_ops


@pytest.fixture(autouse=True)
def _force_matmul():
    fft_ops.set_backend("matmul")
    yield
    fft_ops.set_backend("auto")


def _rand_c(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


@pytest.mark.parametrize("n", [8, 128, 1024, 2048, 4096, 16384, 32768])
def test_fft_matches_numpy(n):
    x = _rand_c((n,), seed=n)
    got = np.asarray(fft_ops.fft(jnp.asarray(x)))
    want = np.fft.fft(x.astype(np.complex128))
    # Relative error scaled by the spectrum magnitude (f32 matmul accumulate).
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    assert err < 2e-5, (n, err)


@pytest.mark.parametrize("n", [1024, 16384])
def test_ifft_roundtrip(n):
    x = _rand_c((4, n), seed=n + 1)
    y = fft_ops.ifft(fft_ops.fft(jnp.asarray(x)))
    err = np.abs(np.asarray(y) - x).max()
    assert err < 1e-4, err


def test_batched_matches_numpy():
    x = _rand_c((3, 5, 2048), seed=2)
    got = np.asarray(fft_ops.fft(jnp.asarray(x)))
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-5, err


def test_padding():
    x = _rand_c((100,), seed=3)
    got = np.asarray(fft_ops.fft(jnp.asarray(x), n=256))
    want = np.fft.fft(x.astype(np.complex128), n=256)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_truncation():
    x = _rand_c((300,), seed=4)
    got = np.asarray(fft_ops.fft(jnp.asarray(x), n=128))
    want = np.fft.fft(x.astype(np.complex128)[:128])
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_axis_argument():
    x = _rand_c((64, 7), seed=5)
    got = np.asarray(fft_ops.fft(jnp.asarray(x), axis=0))
    want = np.fft.fft(x.astype(np.complex128), axis=0)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_non_pow2_composite():
    # 1536 = 512 * 3: four-step with non-square factorization.
    x = _rand_c((1536,), seed=6)
    got = np.asarray(fft_ops.fft(jnp.asarray(x)))
    want = np.fft.fft(x.astype(np.complex128))
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_prime_length_rejected():
    with pytest.raises(ValueError):
        fft_ops.fft(jnp.zeros(2053, jnp.complex64))  # 2053 is prime > MAX_DIRECT


def test_split_representation():
    x = _rand_c((2048,), seed=7)
    re, im = fft_ops.fft_re_im(jnp.real(jnp.asarray(x)), jnp.imag(jnp.asarray(x)))
    want = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_gcc_phat_still_accurate_with_matmul_fft():
    """Integration: sub-sample TDOA holds on the matmul FFT path."""
    from radio_mapper_tpu.ops import gcc_phat as gp

    fs = 2_400_000.0
    n = 16_384
    rng = np.random.default_rng(11)
    f = np.fft.fftfreq(n, 1 / fs)
    spec = (rng.normal(size=n) + 1j * rng.normal(size=n)) * (np.abs(f) <= 100e3)
    s = np.fft.ifft(spec)
    s /= np.sqrt(np.mean(np.abs(s) ** 2))
    true_lag = 17.31
    x = np.fft.ifft(np.fft.fft(s) * np.exp(-2j * np.pi * f * true_lag / fs))
    peak = gp.gcc_phat(
        jnp.asarray(x, jnp.complex64),
        jnp.asarray(s, jnp.complex64),
        sample_rate_hz=fs,
        max_lag=256,
    )
    assert abs(float(peak.lag_samples) - true_lag) < 0.1
