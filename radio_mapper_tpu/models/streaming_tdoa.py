"""Continuous streaming TDOA: channelize → correlate → solve with state.

BASELINE config 3: "8 buoys × 16 channels, continuous overlap-save
streaming correlation, 1-chip real time". Each `step` consumes one
multi-buoy wideband block, advances the overlap-save channelizer state,
cross-correlates every buoy pair in every sub-channel, and solves for a
position per sub-channel — all one jit program. `scan` folds `step` over
many blocks with `lax.scan` (the throughput shape used by the bench), and
the identical math runs space-parallel instead of time-sequential via
:mod:`radio_mapper_tpu.parallel.sharded`.

The reference's analog is one Python thread per buoy chewing 8192-sample
blocks with no cross-block continuity and no waveform correlation at all
(`iq_stream_client.py:490-525`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radio_mapper_tpu import solver
from radio_mapper_tpu.models.streaming import ChannelizerState, StreamingChannelizer
from radio_mapper_tpu.ops import gcc_phat as gcc_ops


@dataclasses.dataclass(frozen=True)
class StreamingTDOAConfig:
    num_buoys: int = 8
    num_subchannels: int = 16
    taps_per_channel: int = 8
    sample_rate_hz: float = 2_400_000.0
    block_len: int = 16_384  # per step, per buoy (multiple of subchannels)
    max_lag: int = 32  # at the sub-channel rate
    weighting: str = "phat"
    solver_iterations: int = 20
    psr_floor: float = 1.1
    psr_scale: float = 2.0

    @property
    def num_pairs(self) -> int:
        return self.num_buoys * (self.num_buoys - 1) // 2

    @property
    def subchannel_rate_hz(self) -> float:
        return self.sample_rate_hz / self.num_subchannels


class StreamingStepOutput(NamedTuple):
    fixes_enu: jnp.ndarray  # [M, 3]
    lags: jnp.ndarray  # [M, P] sub-channel-rate samples
    psr: jnp.ndarray  # [M, P]
    weights: jnp.ndarray  # [M, P]
    cost: jnp.ndarray  # [M]
    # per-subchannel 1σ horizontal error ellipse (solver CRLB)
    ellipse_major_m: jnp.ndarray  # [M]
    ellipse_minor_m: jnp.ndarray  # [M]
    ellipse_orientation_deg: jnp.ndarray  # [M]


class StreamingTDOA:
    def __init__(self, config: StreamingTDOAConfig):
        self.config = config
        if config.block_len % config.num_subchannels:
            raise ValueError("block_len must be a multiple of num_subchannels")
        self.channelizer = StreamingChannelizer(
            config.num_subchannels,
            sample_rate_hz=config.sample_rate_hz,
            taps_per_channel=config.taps_per_channel,
        )
        i_idx, j_idx = gcc_ops.pair_indices(config.num_buoys)
        self.pair_i = jnp.asarray(i_idx)
        self.pair_j = jnp.asarray(j_idx)

    def init_state(self) -> ChannelizerState:
        return self.channelizer.init_state((self.config.num_buoys,))

    def step(
        self,
        state: ChannelizerState,
        block: jnp.ndarray,  # [B, L] complex64
        anchors_enu: jnp.ndarray,  # [B, 3]
    ) -> Tuple[ChannelizerState, StreamingStepOutput]:
        cfg = self.config
        state, chs = self.channelizer.step(state, block)
        sub = jnp.moveaxis(chs.channels, 0, 1)  # [M, B, F]
        corr = gcc_ops.gcc_phat_all_pairs(
            sub,
            sample_rate_hz=cfg.subchannel_rate_hz,
            max_lag=cfg.max_lag,
            weighting=cfg.weighting,
        )
        weights = jnp.clip((corr.psr - cfg.psr_floor) / cfg.psr_scale, 0.0, 1.0) + 1e-3
        dd = solver.tau_to_distance_difference(corr.tau_s)
        res = solver.solve_tdoa(
            anchors_enu,
            self.pair_i,
            self.pair_j,
            dd,
            weights,
            iterations=cfg.solver_iterations,
        )
        return state, StreamingStepOutput(
            fixes_enu=res.position_enu,
            lags=corr.lag_samples,
            psr=corr.psr,
            weights=weights,
            cost=res.cost,
            ellipse_major_m=res.ellipse_major_m,
            ellipse_minor_m=res.ellipse_minor_m,
            ellipse_orientation_deg=res.ellipse_orientation_deg,
        )

    def jit_step(self):
        return jax.jit(self.step)

    def scan(
        self,
        blocks: jnp.ndarray,  # [T, B, L]
        anchors_enu: jnp.ndarray,
        state: Optional[ChannelizerState] = None,
    ) -> Tuple[ChannelizerState, StreamingStepOutput]:
        """Fold `step` over T consecutive blocks in one compiled program."""
        if state is None:
            state = self.init_state()

        def body(carry, block):
            new_state, out = self.step(carry, block, anchors_enu)
            return new_state, out

        return jax.lax.scan(body, state, blocks)

    def jit_scan(self):
        return jax.jit(self.scan)

    def example_inputs(self, *, num_blocks: int = 4, seed: int = 0):
        cfg = self.config
        rng = np.random.default_rng(seed)
        blocks = (
            rng.normal(size=(num_blocks, cfg.num_buoys, cfg.block_len))
            + 1j * rng.normal(size=(num_blocks, cfg.num_buoys, cfg.block_len))
        ).astype(np.complex64)
        anchors = rng.normal(scale=8_000.0, size=(cfg.num_buoys, 3)).astype(np.float32)
        anchors[:, 2] = 0.0
        return jnp.asarray(blocks), jnp.asarray(anchors)
