"""Streaming TDOA model: continuity, physics recovery, scan equivalence."""

import numpy as np
import jax.numpy as jnp

from radio_mapper_tpu import sim
from radio_mapper_tpu.models.streaming_tdoa import StreamingTDOA, StreamingTDOAConfig


def test_scan_equals_sequential_steps():
    cfg = StreamingTDOAConfig(
        num_buoys=3, num_subchannels=4, taps_per_channel=4,
        block_len=1024, max_lag=8, solver_iterations=5,
    )
    st = StreamingTDOA(cfg)
    blocks, anchors = st.example_inputs(num_blocks=3, seed=1)

    state = st.init_state()
    outs = []
    step = st.jit_step()
    for k in range(3):
        state, out = step(state, blocks[k], anchors)
        outs.append(out)

    _, scanned = st.jit_scan()(blocks, anchors)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(scanned.lags)[k], np.asarray(outs[k].lags), atol=1e-4
        )
        # Pure-noise inputs make the solve ill-conditioned; scan vs eager
        # reassociation moves the (meaningless) fix slightly.
        np.testing.assert_allclose(
            np.asarray(scanned.fixes_enu)[k],
            np.asarray(outs[k].fixes_enu),
            rtol=1e-3, atol=1.0,
        )


def test_streaming_recovers_emitter_from_scenario():
    """Synthetic 4-buoy scene, wideband noise emitter: the sub-channel that
    holds the signal produces an accurate streaming fix."""
    scen = sim.default_scenario(
        signal="noise", bandwidth_hz=110e3, snr_db=25.0, seed=6,
        block_len=32_768,
    )
    cap = sim.synthesize(scen)
    cfg = StreamingTDOAConfig(
        num_buoys=4, num_subchannels=8, taps_per_channel=6,
        sample_rate_hz=scen.sample_rate_hz, block_len=16_384,
        max_lag=8, solver_iterations=25,
    )
    st = StreamingTDOA(cfg)
    anchors = jnp.asarray(cap.buoy_enu, jnp.float32)
    state = st.init_state()
    step = st.jit_step()
    # Two consecutive blocks of the same capture.
    outs = []
    for k in range(2):
        blk = jnp.asarray(cap.iq[:, k * 16_384 : (k + 1) * 16_384], jnp.complex64)
        state, out = step(state, blk, anchors)
        outs.append(out)
    out = outs[1]  # second block: channelizer state warmed up

    # The emitter is at baseband offset 0 ⇒ center sub-channel (index M/2
    # after fftshift ordering).
    weights = np.asarray(out.weights)
    best_ch = int(np.argmax(weights.sum(axis=-1)))
    est = np.asarray(out.fixes_enu)[best_ch]
    err = np.linalg.norm(est[:2] - cap.emitter_enu[0][:2])
    # Sub-channel rate 256 kS/s ⇒ 1 sample ≈ 1.17 km; PHAT interpolation
    # must land within a few hundred meters.
    assert err < 600.0, err
    # Non-signal channels have visibly lower correlation quality.
    psr = np.asarray(out.psr).mean(axis=-1)
    assert psr[best_ch] >= np.median(psr)


def test_state_continuity_matters():
    """Warm state must reproduce the one-shot capture exactly (no seams)."""
    cfg = StreamingTDOAConfig(
        num_buoys=2, num_subchannels=4, taps_per_channel=4,
        block_len=2048, max_lag=8, solver_iterations=3,
    )
    st = StreamingTDOA(cfg)
    rng = np.random.default_rng(2)
    stream = (rng.normal(size=(2, 4096)) + 1j * rng.normal(size=(2, 4096))).astype(np.complex64)
    anchors = np.zeros((2, 3), np.float32)
    anchors[1, 0] = 5000.0

    # Two stateful steps over halves.
    state = st.init_state()
    step = st.jit_step()
    state, o1 = step(state, jnp.asarray(stream[:, :2048]), jnp.asarray(anchors))
    state, o2 = step(state, jnp.asarray(stream[:, 2048:]), jnp.asarray(anchors))

    # One config with double block consuming it all at once.
    cfg_big = StreamingTDOAConfig(
        num_buoys=2, num_subchannels=4, taps_per_channel=4,
        block_len=4096, max_lag=8, solver_iterations=3,
    )
    st_big = StreamingTDOA(cfg_big)
    sb, ob = st_big.jit_step()(st_big.init_state(), jnp.asarray(stream), jnp.asarray(anchors))

    # The channelizer tails must match after consuming identical samples.
    np.testing.assert_allclose(
        np.asarray(state.tail), np.asarray(sb.tail), atol=1e-5
    )


def test_many_buoy_wideband_shape():
    """BASELINE config-4 shape, scaled for CI: 16 buoys, wideband stream,
    polyphase channelizer + all-pairs GCC (120 pairs) in one jitted step."""
    from radio_mapper_tpu.ops.gcc_phat import pair_indices

    cfg = StreamingTDOAConfig(
        num_buoys=16, num_subchannels=8, taps_per_channel=4,
        sample_rate_hz=10_000_000.0, block_len=8192, max_lag=8,
        solver_iterations=8,
    )
    st = StreamingTDOA(cfg)
    assert cfg.num_pairs == 120
    blocks, anchors = st.example_inputs(num_blocks=1, seed=9)
    state, out = st.jit_step()(st.init_state(), blocks[0], anchors)
    assert out.lags.shape == (8, 120)
    assert out.fixes_enu.shape == (8, 3)
    assert bool(np.isfinite(np.asarray(out.fixes_enu)).all())
