"""Streaming (stateful) channelization and correlation.

The reference processes streams as *independent* 8192-sample blocks — any
signal structure spanning a block boundary is lost
(`iq_stream_client.py:496-503`). Here streaming is overlap-save: the
channelizer carries its (T−1)·M-sample filter history between blocks, so
back-to-back calls produce exactly the same channel samples as one giant
call. Two deployment shapes:

- **Sequential** (:class:`StreamingChannelizer`): one host feeding blocks,
  carry state threaded through `step` — jit-friendly (state is a plain
  array), suitable for `lax.scan` over many blocks.
- **Sharded** (:func:`sharded_channelize`): one long capture laid out
  across the "blk" mesh axis; the history arrives from the left neighbor
  by `ppermute` halo exchange instead of a Python carry
  (:mod:`radio_mapper_tpu.parallel.halo`). Identical numerics, S× the
  throughput.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from radio_mapper_tpu.ops import channelizer as pfb
from radio_mapper_tpu.parallel.halo import with_left_halo


class ChannelizerState(NamedTuple):
    tail: jnp.ndarray  # [..., (T-1)*M] carried filter history


class StreamingChannelizer:
    def __init__(
        self,
        num_channels: int,
        *,
        sample_rate_hz: float,
        taps_per_channel: int = 8,
    ):
        self.m = num_channels
        self.taps = taps_per_channel
        self.sample_rate_hz = sample_rate_hz
        self.history = (taps_per_channel - 1) * num_channels

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> ChannelizerState:
        return ChannelizerState(
            tail=jnp.zeros((*batch_shape, self.history), jnp.complex64)
        )

    def step(
        self, state: ChannelizerState, block: jnp.ndarray
    ) -> Tuple[ChannelizerState, pfb.ChannelizedStream]:
        """Channelize one block ``[..., L]`` (L a multiple of M).

        Emits exactly L/M frames per channel — gap-free across calls.
        """
        if block.shape[-1] % self.m != 0:
            raise ValueError(
                f"block length {block.shape[-1]} not a multiple of {self.m}"
            )
        ext = jnp.concatenate([state.tail, block], axis=-1)
        out = pfb.channelize(
            ext,
            self.m,
            sample_rate_hz=self.sample_rate_hz,
            taps_per_channel=self.taps,
        )
        new_state = ChannelizerState(tail=ext[..., -self.history :])
        return new_state, out


def sharded_channelize(
    x_local: jnp.ndarray,
    num_channels: int,
    *,
    sample_rate_hz: float,
    taps_per_channel: int = 8,
    block_axis_name: str = "blk",
) -> pfb.ChannelizedStream:
    """Shard-local overlap-save channelization (call inside `shard_map`).

    ``x_local``: this shard's ``[..., L]`` slice of a stream sharded on the
    last axis over ``block_axis_name``. The (T−1)·M-sample history comes
    from the left neighbor via one `ppermute` hop; shard 0 sees zeros (the
    stream-start transient), matching :class:`StreamingChannelizer`'s
    initial state. Output frames concatenated across shards equal the
    sequential output exactly.
    """
    m = num_channels
    history = (taps_per_channel - 1) * m
    if x_local.shape[-1] % m != 0:
        raise ValueError(f"shard length {x_local.shape[-1]} not a multiple of {m}")
    ext = with_left_halo(x_local, block_axis_name, history)
    return pfb.channelize(
        ext, m, sample_rate_hz=sample_rate_hz, taps_per_channel=taps_per_channel
    )
