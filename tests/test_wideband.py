"""BASELINE config-4 wideband pipeline: channelize → per-subchannel
all-pairs GCC → solve, on a physically synthesized scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from radio_mapper_tpu import constants, sim
from radio_mapper_tpu.models.wideband import WidebandConfig, WidebandTDOAPipeline

C = constants.SPEED_OF_LIGHT_M_S


def _small_cfg(**kw):
    base = dict(
        num_buoys=8, wide_rate_hz=4_096_000.0, num_subchannels=8,
        sub_block=1024, max_lag=64, solver_iterations=20,
    )
    base.update(kw)
    return WidebandConfig(**base)


def _synth_scene(cfg, sub_idx, seed=0, snr_db=25.0):
    """Emitter radiating band-limited noise inside subchannel ``sub_idx``
    (unshifted FFT channel order), received by a ring of buoys with exact
    fractional delays at the WIDE rate."""
    rng = np.random.default_rng(seed)
    b, n = cfg.num_buoys, cfg.wide_block
    fs = cfg.wide_rate_hz
    # ring of receivers, emitter inside
    ang = 2 * np.pi * np.arange(b) / b
    anchors = np.stack(
        [9_000 * np.cos(ang), 9_000 * np.sin(ang), np.zeros(b)], axis=-1
    ).astype(np.float32)
    emitter = np.array([1_500.0, -2_200.0, 0.0])

    # band-limited noise at the subchannel center
    f0 = np.fft.fftfreq(cfg.num_subchannels, d=1.0 / fs)[sub_idx]
    bw = 0.5 * cfg.sub_rate_hz
    base = rng.normal(size=2 * n).view(np.complex128)[:n]
    spec = np.fft.fft(base)
    f = np.fft.fftfreq(n, 1.0 / fs)
    spec[np.abs(f) > bw / 2] = 0.0
    s = np.fft.ifft(spec)
    s *= np.exp(2j * np.pi * f0 * np.arange(n) / fs)
    s /= np.std(s)

    amp = 10 ** (snr_db / 20.0)
    iq = np.empty((b, n), np.complex128)
    for k in range(b):
        tau = np.linalg.norm(emitter - anchors[k]) / C
        iq[k] = amp * sim._apply_delay(s, tau, fs)
    iq += (rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))) / np.sqrt(2)
    return (
        iq.real.astype(np.float32), iq.imag.astype(np.float32),
        anchors, emitter,
    )


def test_config_shapes():
    cfg = _small_cfg()
    assert cfg.wide_block == 8 * (1024 + 7)
    assert cfg.num_pairs == 28
    assert cfg.sub_rate_hz == 512_000.0
    with pytest.raises(ValueError):
        _small_cfg(max_lag=2048).validate()


def test_wideband_fix_in_active_subchannel():
    cfg = _small_cfg()
    pipe = WidebandTDOAPipeline(cfg)
    sub = 3
    re, im, anchors, emitter = _synth_scene(cfg, sub, seed=1)
    out = pipe.jit_step_split()(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)
    )
    assert out.fixes_enu.shape == (cfg.num_subchannels, 3)
    assert out.lags.shape == (cfg.num_subchannels, cfg.num_pairs)
    err = np.linalg.norm(
        np.asarray(out.fixes_enu)[sub, :2] - emitter[:2]
    )
    # subchannel sample = 585 m; sub-sample GCC + 28-pair solve should be
    # well inside one sample
    assert err < 300.0, err
    # the active subchannel's correlations must be judged far better than
    # a quiet one's (PSR-based weights)
    w = np.asarray(out.weights)
    quiet = (sub + 4) % cfg.num_subchannels
    assert w[sub].mean() > 3 * w[quiet].mean(), (w[sub].mean(), w[quiet].mean())


def test_wideband_flagship_shape_traces():
    """The real config-4 shape (64 buoys, 10 MS/s, 16 subchannels, 2016
    pairs) must build and trace; execution at this size belongs to the
    on-chip bench (bench.run_wideband_bench)."""
    import jax

    cfg = WidebandConfig()
    pipe = WidebandTDOAPipeline(cfg)
    re, im, anchors = pipe.example_inputs(seed=0)
    jax.eval_shape(pipe.step_split, re, im, anchors)
    assert cfg.num_pairs == 2016
    assert cfg.wide_block == 16 * (4096 + 7)
