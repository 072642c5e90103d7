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
    """Emitter radiating band-limited noise inside subchannel ``sub_idx``,
    received by a ring of buoys (sim.synthesize_wideband)."""
    b = cfg.num_buoys
    ang = 2 * np.pi * np.arange(b) / b
    anchors = np.stack(
        [9_000 * np.cos(ang), 9_000 * np.sin(ang), np.zeros(b)], axis=-1
    ).astype(np.float32)
    emitter = np.array([1_500.0, -2_200.0, 0.0])
    re, im = sim.synthesize_wideband(
        cfg, active_subchannel=sub_idx, anchors_enu=anchors,
        emitter_enu=emitter, snr_db=snr_db, seed=seed,
    )
    return re, im, anchors, emitter


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


def test_wideband_sharded_over_subchannels():
    """Config-4 across a mesh: subchannels shard over an 8-device axis;
    outputs equal the single-device scan."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8])
    if devices.size < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    from radio_mapper_tpu.models.wideband import build_wideband_sharded_step

    cfg = _small_cfg()
    mesh = Mesh(devices, ("sub",))
    step, shardings = build_wideband_sharded_step(mesh, cfg)
    sub = 3
    re, im, anchors, emitter = _synth_scene(cfg, sub, seed=2)
    out = step(
        jax.device_put(re, shardings[0]),
        jax.device_put(im, shardings[1]),
        jax.device_put(anchors, shardings[2]),
    )
    ref = WidebandTDOAPipeline(cfg).jit_step_split()(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)
    )
    # tight equality on the ACTIVE subchannel's fix and every weight;
    # quiet subchannels solve pure noise (fixes at ~6e5 m) where f32
    # op-ordering differences between the two programs legitimately move
    # the meaningless solution by ~1e-2 relative (the r5 batched tail
    # shifted fusion order; observed max 8.7e-3 on one noise fix)
    np.testing.assert_allclose(
        np.asarray(out.fixes_enu)[sub], np.asarray(ref.fixes_enu)[sub],
        rtol=0, atol=1.0,
    )
    np.testing.assert_allclose(
        np.asarray(out.fixes_enu), np.asarray(ref.fixes_enu),
        rtol=2e-2, atol=1.0,
    )
    np.testing.assert_allclose(
        np.asarray(out.weights), np.asarray(ref.weights), rtol=0, atol=1e-4
    )
    err = np.linalg.norm(np.asarray(out.fixes_enu)[sub, :2] - emitter[:2])
    assert err < 300.0, err
