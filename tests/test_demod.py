"""Demodulator tests against closed-form signals."""

import numpy as np
import jax.numpy as jnp
import pytest

from radio_mapper_tpu.ops import demod

FS = 256_000.0
N = 65_536


def _fm_signal(msg_hz=1000.0, dev_hz=5000.0, fs=FS, n=N):
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * msg_hz * t)
    phase = 2 * np.pi * dev_hz * np.cumsum(msg) / fs
    return np.exp(1j * phase).astype(np.complex64), msg


def test_fm_demod_recovers_message():
    iq, msg = _fm_signal()
    audio = np.asarray(demod.fm_demod(jnp.asarray(iq)))
    # audio[n] ≈ 2π·dev·msg[n]/fs
    expected = 2 * np.pi * 5000.0 * msg / FS
    # Skip the first sample (state-less start).
    corr = np.corrcoef(audio[10:], expected[10:])[0, 1]
    assert corr > 0.999
    assert np.abs(audio).max() < np.pi


def test_fm_demod_streaming_state_continuity():
    iq, _ = _fm_signal()
    full = np.asarray(demod.fm_demod(jnp.asarray(iq)))
    a = demod.fm_demod(jnp.asarray(iq[: N // 2]))
    b = demod.fm_demod(jnp.asarray(iq[N // 2 :]), prev=jnp.asarray(iq[N // 2 - 1 : N // 2]))
    stitched = np.concatenate([np.asarray(a), np.asarray(b)])
    np.testing.assert_allclose(stitched[1:], full[1:], atol=1e-5)


def test_am_demod():
    t = np.arange(N) / FS
    msg = 0.5 * np.sin(2 * np.pi * 800.0 * t)
    iq = ((1.0 + msg) * np.exp(2j * np.pi * 3000.0 * t)).astype(np.complex64)
    audio = np.asarray(demod.am_demod(jnp.asarray(iq)))
    corr = np.corrcoef(audio, msg)[0, 1]
    assert corr > 0.99


def test_ssb_demods_shift_correctly():
    t = np.arange(N) / FS
    # A tone 2 kHz above the carrier → USB with 1.5 kHz BFO hears 500 Hz? No:
    # usb_demod shifts down by bfo; tone at +2 kHz appears at 2−1.5 = 0.5 kHz.
    iq = np.exp(2j * np.pi * 2000.0 * t).astype(np.complex64)
    audio = np.asarray(demod.usb_demod(jnp.asarray(iq), sample_rate_hz=FS, bfo_hz=1500.0))
    spec = np.abs(np.fft.rfft(audio))
    f = np.fft.rfftfreq(N, 1 / FS)
    peak = f[np.argmax(spec)]
    assert abs(peak - 500.0) < 10.0


def test_deemphasis_lowpass():
    # Deemphasis must attenuate 15 kHz much more than 100 Hz.
    t = np.arange(N) / FS
    lo = np.sin(2 * np.pi * 100.0 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 15_000.0 * t).astype(np.float32)
    lo_out, _ = demod.deemphasis(jnp.asarray(lo), sample_rate_hz=FS)
    hi_out, _ = demod.deemphasis(jnp.asarray(hi), sample_rate_hz=FS)
    lo_gain = np.std(np.asarray(lo_out)) / np.std(lo)
    hi_gain = np.std(np.asarray(hi_out)) / np.std(hi)
    assert lo_gain > 0.9
    assert hi_gain < 0.2


def test_squelch_gates_noise():
    rng = np.random.default_rng(0)
    weak = (rng.normal(size=(1, 4096)) * 0.001).astype(np.complex64)
    strong = (rng.normal(size=(1, 4096)) * 1.0).astype(np.complex64)
    blocks = jnp.asarray(np.concatenate([weak, strong]))
    gated, open_ = demod.squelch(blocks, threshold_power=0.01)
    assert not bool(open_[0]) and bool(open_[1])
    assert np.all(np.asarray(gated)[0] == 0)


def test_decimate_average():
    x = jnp.asarray(np.arange(12, dtype=np.float32))
    out = np.asarray(demod.decimate(x, 4))
    np.testing.assert_allclose(out, [1.5, 5.5, 9.5])


def test_resample_preserves_tone():
    t = np.arange(8192) / FS
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    out = np.asarray(demod.resample_pow2(jnp.asarray(tone), 4096))
    f = np.fft.rfftfreq(4096, 2 / FS)
    peak = f[np.argmax(np.abs(np.fft.rfft(out)))]
    assert abs(peak - 1000.0) < 40.0
    assert np.std(out) == pytest.approx(np.std(tone), rel=0.05)


def test_wbfm_pipeline_end_to_end():
    iq, msg = _fm_signal(msg_hz=1000.0, dev_hz=50_000.0)
    audio = np.asarray(demod.wbfm_pipeline(jnp.asarray(iq), sample_rate_hz=FS, audio_rate_hz=32_000.0))
    # Recover a 1 kHz tone at 32 kS/s.
    f = np.fft.rfftfreq(audio.size, 1 / 32_000.0)
    spec = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
    peak = f[np.argmax(spec[5:]) + 5]
    assert abs(peak - 1000.0) < 20.0


def test_nbfm_pipeline_recovers_tone():
    iq, msg = _fm_signal(msg_hz=400.0, dev_hz=2500.0)
    audio = np.asarray(
        demod.nbfm_pipeline(jnp.asarray(iq), sample_rate_hz=FS, audio_rate_hz=16_000.0)
    )
    factor = int(FS / 16_000.0)
    assert audio.shape[-1] == N // factor
    # Decimated message reference (boxcar average like the pipeline).
    ref = msg[: N - N % factor].reshape(-1, factor).mean(axis=-1)
    corr = np.corrcoef(audio[4:], ref[4:])[0, 1]
    assert corr > 0.99


def test_nbfm_optional_deemphasis_attenuates_highs():
    # With deemphasis the high-frequency tone comes out smaller.
    iq_hi, _ = _fm_signal(msg_hz=6000.0, dev_hz=2500.0)
    plain = np.asarray(demod.nbfm_pipeline(jnp.asarray(iq_hi), sample_rate_hz=FS))
    deemph = np.asarray(
        demod.nbfm_pipeline(jnp.asarray(iq_hi), sample_rate_hz=FS, deemph_tau_s=75e-6)
    )
    assert np.std(deemph) < 0.7 * np.std(plain)


def test_demod_cli_raw_and_nbfm(tmp_path):
    from radio_mapper_tpu import cli

    out = tmp_path / "audio.pcm"
    cli.main(["demod", "--mode", "raw", "--source", "sim",
              "--seconds", "0.05", "--output", str(out)])
    raw = np.fromfile(out, np.int16)
    assert raw.size == 2 * int(0.05 * 1_024_000)

    out2 = tmp_path / "audio2.pcm"
    cli.main(["demod", "--mode", "nbfm", "--source", "sim",
              "--seconds", "0.05", "--output", str(out2)])
    pcm = np.fromfile(out2, np.int16)
    assert pcm.size > 0 and np.abs(pcm).max() <= 32000


# ------------------------------------------------------- simultaneous watch


def test_watch_demod_block_squelch_gating():
    """Two watch channels from one capture: the FM-occupied one opens,
    the empty one squelches (rtl_fm's scan semantics without hopping,
    `rtl_fm.c:939-974` — all frequencies watched simultaneously)."""
    fs = 1_024_000.0
    n = 131_072
    t = np.arange(n) / fs
    iq_fm, _ = _fm_signal(fs=fs, n=n, msg_hz=800.0, dev_hz=4000.0)
    # FM carrier at +200 kHz, nothing at −200 kHz but weak noise.
    rng = np.random.default_rng(0)
    iq = iq_fm * np.exp(2j * np.pi * 200e3 * t) + 0.01 * (
        rng.normal(size=n) + 1j * rng.normal(size=n)
    )
    audio, open_ = demod.watch_demod_block(
        jnp.asarray(iq.astype(np.complex64)),
        sample_rate_hz=fs,
        offsets_hz=(200e3, -200e3),
        mode="nbfm",
        channel_rate_hz=256_000.0,
        audio_rate_hz=16_000.0,
        squelch_threshold=0.05,
    )
    open_np = np.asarray(open_)
    audio_np = np.asarray(audio)
    assert open_np.tolist() == [True, False]
    assert np.std(audio_np[0]) > 1e-3  # live channel carries audio
    assert np.allclose(audio_np[1], 0.0)  # squelched channel muted


def test_demod_cli_watch_writes_per_channel_wavs(tmp_path):
    """CLI --watch: per-channel WAV sinks; the emitter's channel records,
    the empty watch frequency stays squelched."""
    import wave

    from radio_mapper_tpu import cli

    out = tmp_path / "watch"
    # The sim scenario's FM emitter sits at 121.5 MHz; 121.9 is empty.
    cli.main([
        "demod", "--watch", "--source", "sim", "--mode", "nbfm",
        "--frequency", "121.5", "121.9",
        "--squelch", "0.05", "--seconds", "0.4", "--dwell", "0.1",
        "--output", str(out),
    ])
    with wave.open(str(tmp_path / "watch.121.5000MHz.wav")) as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        frames = w.readframes(w.getnframes())
        pcm = np.frombuffer(frames, np.int16)
        assert pcm.size > 0 and np.abs(pcm).max() > 100
    with wave.open(str(tmp_path / "watch.121.9000MHz.wav")) as w:
        assert w.getnframes() == 0  # squelch never opened
