import numpy as np
import jax.numpy as jnp

from radio_mapper_tpu.ops import channelizer


FS = 2_048_000.0


def test_tone_lands_in_correct_channel():
    m = 16
    n = 16_384
    ch_bw = FS / m  # 128 kHz channels
    t = np.arange(n) / FS
    # Tone at the center of channel +3 (offset 3*128 kHz).
    f_tone = 3 * ch_bw
    x = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
    out = channelizer.channelize(jnp.asarray(x), m, sample_rate_hz=FS)
    power = np.mean(np.abs(np.asarray(out.channels)) ** 2, axis=-1)
    best = int(np.argmax(power))
    want = int(np.argmin(np.abs(out.channel_offset_hz - f_tone)))
    assert best == want, (best, want, power)
    # Energy concentration: winning channel dominates by >20 dB.
    others = np.delete(power, best)
    assert power[best] > 100 * others.max()


def test_channel_baseband_frequency():
    """A tone offset +10 kHz inside its channel appears at +10 kHz baseband."""
    m = 16
    n = 32_768
    ch_bw = FS / m
    t = np.arange(n) / FS
    f_tone = 2 * ch_bw + 10_000.0
    x = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
    out = channelizer.channelize(jnp.asarray(x), m, sample_rate_hz=FS)
    ci = int(np.argmin(np.abs(out.channel_offset_hz - 2 * ch_bw)))
    ch = np.asarray(out.channels)[ci]
    spec = np.abs(np.fft.fft(ch))
    freqs = np.fft.fftfreq(ch.shape[-1], 1.0 / out.channel_rate_hz)
    f_est = freqs[int(np.argmax(spec))]
    assert abs(f_est - 10_000.0) < out.channel_rate_hz / ch.shape[-1] * 2


def test_adjacent_channel_rejection():
    m = 32
    n = 32_768
    ch_bw = FS / m
    t = np.arange(n) / FS
    x = np.exp(2j * np.pi * (5 * ch_bw) * t).astype(np.complex64)
    out = channelizer.channelize(jnp.asarray(x), m, sample_rate_hz=FS)
    power = np.mean(np.abs(np.asarray(out.channels)) ** 2, axis=-1)
    k = int(np.argmin(np.abs(out.channel_offset_hz - 5 * ch_bw)))
    rejection_db = 10 * np.log10(power[k] / (power[(k + 2) % m] + 1e-30))
    assert rejection_db > 40.0, rejection_db


def test_batched_channelize():
    m = 8
    x = (np.random.default_rng(0).normal(size=(3, 4096)) + 0j).astype(np.complex64)
    out = channelizer.channelize(jnp.asarray(x), m, sample_rate_hz=FS)
    frames = 4096 // m - 8 + 1
    assert out.channels.shape == (3, m, frames)
    assert out.channel_rate_hz == FS / m


def test_prototype_filter_dc_gain():
    h = channelizer.prototype_filter(16, 8)
    assert h.shape == (8, 16)
    # Branch-summed DC gain ≈ M (per-sample unity after the M-point FFT).
    np.testing.assert_allclose(h.sum(), 16.0, rtol=1e-3)
