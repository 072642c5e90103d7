"""Long-stream soak of the stateful overlap-save streaming pipeline
(VERDICT r4 item 8).

The reference's stream client simply accepts cross-block corruption — it
chews fixed blocks with no carried filter state
(`/root/reference/iq_stream_client.py:496-503`). Here the channelizer
carries overlap-save state across EVERY block, so three properties must
hold over thousands of carried-state steps:

  1. bit-continuity — stepping block-by-block through the host loop
     (production shape) equals one `lax.scan` over the same blocks,
     bitwise, state included;
  2. stable τ — an emitter whose delayed waveform spans every block
     boundary yields the same lag in every block, no drift over the run;
  3. bounded memory — the host loop's RSS high-water mark stops growing
     once steady (no leak of device buffers or traced state).
"""

import resource

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radio_mapper_tpu.models.streaming_tdoa import (
    StreamingTDOA,
    StreamingTDOAConfig,
)

CFG = StreamingTDOAConfig(
    num_buoys=4,
    num_subchannels=8,
    taps_per_channel=4,
    sample_rate_hz=2_048_000.0,
    block_len=1024,
    max_lag=16,
    solver_iterations=8,
)
NUM_BLOCKS = 2000
DELAYS = [0, 16, 32, 48]  # wide samples; buoy b hears s(t − D_b)


def _delayed_stream(num_blocks: int, seed: int = 0):
    """Continuous bandlimited noise received at integer delays + noise.

    One long emitter waveform sliced into consecutive blocks — every
    block boundary splits the SAME waveform, which is exactly the case
    overlap-save continuity exists for."""
    rng = np.random.default_rng(seed)
    n = num_blocks * CFG.block_len
    pad = max(DELAYS)
    s = (
        rng.normal(size=n + pad) + 1j * rng.normal(size=n + pad)
    ).astype(np.complex64)
    rx = np.stack(
        [s[pad - d : pad - d + n] for d in DELAYS]
    )  # [B, n]
    rx += 0.05 * (
        rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)
    ).astype(np.complex64)
    return rx.reshape(CFG.num_buoys, num_blocks, CFG.block_len).transpose(1, 0, 2)


@pytest.fixture(scope="module")
def soak():
    """Run the soak ONCE; the tests below assert different properties."""
    model = StreamingTDOA(CFG)
    blocks = _delayed_stream(NUM_BLOCKS)
    rng = np.random.default_rng(1)
    anchors = rng.normal(scale=5_000.0, size=(CFG.num_buoys, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    anchors = jnp.asarray(anchors)
    step = model.jit_step()

    state = model.init_state()
    lags = np.empty((NUM_BLOCKS, CFG.num_subchannels, CFG.num_pairs), np.float32)
    rss = {}
    for k in range(NUM_BLOCKS):
        state, out = step(state, jnp.asarray(blocks[k]), anchors)
        lags[k] = np.asarray(out.lags)
        if k in (NUM_BLOCKS // 4, NUM_BLOCKS - 1):
            jax.block_until_ready(state)
            rss[k] = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    jax.block_until_ready(state)
    return dict(
        model=model, blocks=blocks, anchors=anchors, state=state,
        lags=lags, rss=rss,
    )


def test_step_loop_equals_scan_bitwise(soak):
    """Host-loop stepping == lax.scan over the same blocks, bitwise —
    the carried ChannelizerState is continuous, not approximately so."""
    model, blocks, anchors = soak["model"], soak["blocks"], soak["anchors"]
    k = 64  # bitwise equality is established on a prefix; τ stability
    # below covers the full run behaviorally
    scan_state, scan_out = model.jit_scan()(jnp.asarray(blocks[:k]), anchors)

    state = model.init_state()
    step = model.jit_step()
    for i in range(k):
        state, out = step(state, jnp.asarray(blocks[i]), anchors)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(scan_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(out.lags), np.asarray(scan_out.lags[-1])
    )


def test_tau_stable_across_thousands_of_blocks(soak):
    """Every one of the 2000 blocks must localize the boundary-spanning
    emitter at the true pair delays — and the run must show NO drift.

    True lag for pair (i, j) is (D_i − D_j)/M subchannel samples. The
    documented bound: per-block |lag − truth| < 0.35 subchannel samples
    (parabolic-refine noise at this SNR), first-vs-last-10% mean drift
    < 0.05 samples (≈ 24 m at the 256 kHz subchannel rate)."""
    model = soak["model"]
    lags = soak["lags"]  # [T, M, P]
    i_idx = np.asarray(model.pair_i)
    j_idx = np.asarray(model.pair_j)
    truth = (
        np.asarray(DELAYS)[i_idx] - np.asarray(DELAYS)[j_idx]
    ) / CFG.num_subchannels  # subchannel samples

    err = lags - truth[None, None, :]
    assert np.abs(err).max() < 0.35, np.abs(err).max()
    head = lags[: NUM_BLOCKS // 10].mean(axis=0)
    tail = lags[-NUM_BLOCKS // 10 :].mean(axis=0)
    drift = np.abs(head - tail).max()
    assert drift < 0.05, drift


def test_memory_bounded_over_soak(soak):
    """RSS high-water growth between 25% and 100% of the run stays under
    64 MB — carried state is O(1), outputs are consumed per step."""
    rss = soak["rss"]
    (k_mid, k_end) = sorted(rss)
    growth_kb = rss[k_end] - rss[k_mid]
    assert growth_kb < 64 * 1024, f"RSS grew {growth_kb} KiB during soak"
