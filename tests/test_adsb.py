"""Mode-S / ADS-B decoder tests (encode → decode roundtrip)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radio_mapper_tpu.ops import adsb

# A well-known ADS-B test frame (DF17, ICAO 4840D6): 14 bytes with valid CRC.
KNOWN_FRAME = "8d4840d6202cc371c32ce0576098"


def test_crc_of_known_frame_is_zero():
    payload = bytes.fromhex(KNOWN_FRAME)
    bits = []
    for byte in payload:
        for i in range(7, -1, -1):
            bits.append((byte >> i) & 1)
    assert adsb.crc24(np.array(bits, np.uint8)) == 0


def test_append_crc_roundtrip():
    body = KNOWN_FRAME[:-6]
    assert adsb.append_crc(body) == KNOWN_FRAME


def test_encode_decode_roundtrip():
    iq = adsb.encode_frame_iq(KNOWN_FRAME, noise=0.02, seed=1)
    frames = adsb.decode_block(iq)
    assert f"*{KNOWN_FRAME};" in frames


def test_decode_rejects_corrupted_crc():
    bad = KNOWN_FRAME[:-2] + ("00" if KNOWN_FRAME[-2:] != "00" else "01")
    iq = adsb.encode_frame_iq(bad, noise=0.02, seed=2)
    assert adsb.decode_block(iq, require_crc=True) == []
    # Permissive mode (reference behavior) still yields the frame.
    assert len(adsb.decode_block(iq, require_crc=False)) >= 1


def test_multiple_frames_in_block():
    a = adsb.encode_frame_iq(KNOWN_FRAME, pad_before=50, pad_after=600, seed=3)
    b = adsb.encode_frame_iq(KNOWN_FRAME, pad_before=0, pad_after=120, seed=4)
    iq = np.concatenate([a, b])
    frames = adsb.decode_block(iq)
    assert frames.count(f"*{KNOWN_FRAME};") >= 2


def test_noise_only_yields_nothing():
    rng = np.random.default_rng(5)
    iq = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64) * 0.05
    assert adsb.decode_block(iq) == []


def test_batched_detection_shapes():
    iq = np.stack([adsb.encode_frame_iq(KNOWN_FRAME, seed=s, pad_after=200) for s in range(3)])
    # Equal lengths guaranteed by identical padding.
    cands = adsb.detect_frames(jnp.asarray(iq), max_frames=4)
    assert cands.bits.shape == (3, 4, adsb.LONG_BITS)
    assert bool(np.asarray(cands.valid).any(axis=-1).all())
