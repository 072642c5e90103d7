"""Mode-S / ADS-B (1090 MHz) detection and decoding, vectorized.

Capability parity with `Code/src/rtl_adsb.c`: magnitude detection
(rtl_adsb.c:160-181), preamble matching (235-258) and the 2 MS/s
pulse-position bit slicer (183-305) — re-designed from a per-sample C state
machine into batched array ops: one pass computes preamble scores for
every sample position, a static top-K picks candidate frames, and all
candidates slice their 112 bits in parallel. A Mode-S CRC-24 check
validates frames (the reference prints unvalidated frames; we keep its
permissive mode as an option).

Timing (2.0 MS/s, matching `rtl_adsb.c`): preamble pulses at samples
0-1, 2-3, 7-8, 9-10 of a 16-sample (8 µs) preamble; each data bit is 2
samples, PPM: first-half-high = 1.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

ADSB_RATE_HZ = 2_000_000.0
PREAMBLE_SAMPLES = 16
LONG_BITS = 112
SHORT_BITS = 56

# Sample offsets (within the preamble) that carry pulses vs. must be quiet.
_PULSE_OFFSETS = np.array([0, 2, 7, 9])
_QUIET_OFFSETS = np.array([4, 5, 6, 11, 12, 13, 14, 15])

_CRC24_POLY = 0xFFF409


class AdsbCandidates(NamedTuple):
    start_index: jnp.ndarray  # [..., K] int32 sample index of preamble start
    score: jnp.ndarray  # [..., K] preamble quality
    bits: jnp.ndarray  # [..., K, 112] uint8 sliced bits
    valid: jnp.ndarray  # [..., K] bool — passed score threshold


def preamble_score(mag: jnp.ndarray) -> jnp.ndarray:
    """Score each sample index as a potential preamble start.

    score = mean(pulse positions) − mean(quiet positions); high positive
    values mark Mode-S preambles (rtl_adsb.c:235-258's threshold logic).
    """
    n = mag.shape[-1]
    usable = n - (PREAMBLE_SAMPLES + 2 * LONG_BITS)
    idx = jnp.arange(usable)
    pulse = jnp.stack([mag[..., idx + o] for o in _PULSE_OFFSETS], axis=-1)
    quiet = jnp.stack([mag[..., idx + o] for o in _QUIET_OFFSETS], axis=-1)
    return jnp.mean(pulse, axis=-1) - jnp.mean(quiet, axis=-1)


def detect_frames(
    iq: jnp.ndarray,
    *,
    max_frames: int = 8,
    min_score_snr: float = 3.0,
) -> AdsbCandidates:
    """Find up to K Mode-S frames in a block of 2 MS/s complex baseband.

    Batched over leading dims. ``min_score_snr``: required preamble score
    relative to the block's mean magnitude.
    """
    mag = jnp.abs(iq) ** 2
    scores = preamble_score(mag)

    # Suppress non-maxima within a frame length so one frame yields one hit.
    radius = PREAMBLE_SAMPLES
    w = 2 * radius + 1
    window_dims = (1,) * (scores.ndim - 1) + (w,)
    local_max = scores >= jax.lax.reduce_window(
        scores, -jnp.inf, jax.lax.max, window_dims, (1,) * scores.ndim, "SAME"
    )
    floor = jnp.mean(mag, axis=-1, keepdims=True)
    candidate = jnp.logical_and(local_max, scores > min_score_snr * floor)
    masked = jnp.where(candidate, scores, -jnp.inf)
    top_scores, starts = jax.lax.top_k(masked, max_frames)
    valid = jnp.isfinite(top_scores)

    # Slice bits for every candidate: bit k compares the two halves of its
    # 2-sample PPM cell (rtl_adsb.c:183-305).
    bit_idx = PREAMBLE_SAMPLES + 2 * jnp.arange(LONG_BITS)
    pos_a = starts[..., :, None] + bit_idx[None, :]
    pos_b = pos_a + 1
    n = mag.shape[-1]
    flat_a = jnp.clip(pos_a, 0, n - 1)
    flat_b = jnp.clip(pos_b, 0, n - 1)
    mag_e = mag[..., None, :]
    a = jnp.take_along_axis(mag_e, flat_a, axis=-1)
    b = jnp.take_along_axis(mag_e, flat_b, axis=-1)
    bits = (a > b).astype(jnp.uint8)

    return AdsbCandidates(
        start_index=jnp.where(valid, starts, 0).astype(jnp.int32),
        score=jnp.where(valid, top_scores, 0.0),
        bits=bits,
        valid=valid,
    )


def crc24(bits: np.ndarray) -> int:
    """Mode-S CRC-24 remainder (polynomial 0xFFF409, MSB-first).

    Returns 0 for a valid frame whose trailing 24 bits are the parity.
    """
    msg = 0
    for b in bits:
        msg = (msg << 1) | int(b)
    nbits = len(bits)
    for i in range(nbits - 24):
        if msg & (1 << (nbits - 1 - i)):
            msg ^= _CRC24_POLY << (nbits - 24 - 1 - i)
    return msg & 0xFFFFFF


def frame_df(bits: np.ndarray) -> int:
    """Downlink format (first 5 bits)."""
    return int("".join(str(int(b)) for b in bits[:5]), 2)


def bits_to_hex(bits: np.ndarray) -> str:
    """Hex string in rtl_adsb's output convention (`*...;`)."""
    nbytes = len(bits) // 8
    out = []
    for k in range(nbytes):
        byte = 0
        for b in bits[8 * k : 8 * k + 8]:
            byte = (byte << 1) | int(b)
        out.append(f"{byte:02x}")
    return "*" + "".join(out) + ";"


def decode_block(
    iq: np.ndarray,
    *,
    max_frames: int = 8,
    require_crc: bool = True,
) -> List[str]:
    """Host-side convenience: detect, slice, CRC-gate, hex-format frames."""
    cands = detect_frames(jnp.asarray(iq, jnp.complex64), max_frames=max_frames)
    out: List[str] = []
    valid = np.asarray(cands.valid)
    bits_all = np.asarray(cands.bits)
    for k in range(valid.shape[-1]):
        if not valid[k]:
            continue
        bits = bits_all[k]
        df = frame_df(bits)
        length = LONG_BITS if df >= 16 else SHORT_BITS
        frame_bits = bits[:length]
        if require_crc and crc24(frame_bits) != 0:
            continue
        out.append(bits_to_hex(frame_bits))
    return out


# --- test-support encoder ----------------------------------------------------


def encode_frame_iq(
    payload_hex: str, *, amplitude: float = 1.0, noise: float = 0.01,
    pad_before: int = 100, pad_after: int = 100, seed: int = 0,
) -> np.ndarray:
    """Synthesize the 2 MS/s waveform of a Mode-S frame (for tests)."""
    rng = np.random.default_rng(seed)
    payload = bytes.fromhex(payload_hex)
    bits = []
    for byte in payload:
        for i in range(7, -1, -1):
            bits.append((byte >> i) & 1)
    samples = np.zeros(PREAMBLE_SAMPLES + 2 * len(bits), np.float64)
    for o in _PULSE_OFFSETS:
        samples[o] = 1.0  # 0.5 us pulse = one sample at 2 MS/s
    for k, b in enumerate(bits):
        cell = PREAMBLE_SAMPLES + 2 * k
        samples[cell + (0 if b else 1)] = 1.0
    mag = np.concatenate([np.zeros(pad_before), samples, np.zeros(pad_after)])
    field = np.sqrt(mag) * amplitude
    noise_iq = (rng.normal(size=field.size) + 1j * rng.normal(size=field.size)) * noise
    return (field + noise_iq).astype(np.complex64)


def append_crc(payload_hex_no_crc: str) -> str:
    """Compute and append the 24-bit Mode-S CRC to a hex payload."""
    payload = bytes.fromhex(payload_hex_no_crc)
    bits = []
    for byte in payload:
        for i in range(7, -1, -1):
            bits.append((byte >> i) & 1)
    bits_full = np.array(bits + [0] * 24, dtype=np.uint8)
    rem = crc24(bits_full)
    return payload_hex_no_crc + f"{rem:06x}"
