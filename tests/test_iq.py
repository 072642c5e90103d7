import numpy as np
import jax.numpy as jnp

from radio_mapper_tpu.ops import iq


def test_decode_matches_reference_semantics():
    # Reference decode: (u8 - 127.5), even bytes are I, odd are Q
    # (`buoy_node.py:392-398`).
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=4096, dtype=np.uint8)
    got = np.asarray(iq.decode_uint8_iq(jnp.asarray(raw)))
    f = raw.astype(np.float64) - 127.5
    want = f[0::2] + 1j * f[1::2]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_decode_batched():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(3, 5, 512), dtype=np.uint8)
    got = iq.decode_uint8_iq(jnp.asarray(raw))
    assert got.shape == (3, 5, 256)
    assert got.dtype == jnp.complex64


def test_roundtrip():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, size=1024, dtype=np.uint8)
    dec = iq.decode_uint8_iq(jnp.asarray(raw))
    enc = np.asarray(iq.encode_uint8_iq(dec))
    np.testing.assert_array_equal(enc, raw)


def test_numpy_golden_agrees_with_jax():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=2048, dtype=np.uint8)
    a = np.asarray(iq.decode_uint8_iq(jnp.asarray(raw), scale=iq.UINT8_SCALE))
    b = iq.decode_uint8_iq_numpy(raw, scale=iq.UINT8_SCALE)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_bin_file_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    data = (rng.normal(size=256) + 1j * rng.normal(size=256)) * 30.0
    path = str(tmp_path / "cap.bin")
    iq.save_iq_bin(path, data)
    loaded = iq.load_iq_bin(path)
    assert loaded.shape == (256,)
    # Quantization error bounded by half a count.
    np.testing.assert_allclose(loaded.real, np.clip(np.round(data.real), -127.5, 127.5), atol=0.51)


def test_iq_wire_codec_error_paths():
    """Unknown wire formats must raise, not silently mis-decode."""
    import numpy as np
    import pytest

    from radio_mapper_tpu.runtime.datamodel import decode_iq_wire, encode_iq_wire

    iq = (np.arange(8) + 1j * np.arange(8)).astype(np.complex64)
    with pytest.raises(ValueError):
        encode_iq_wire(iq, "f32")
    samples, extra = encode_iq_wire(iq, "u8")
    with pytest.raises(ValueError):
        decode_iq_wire(samples, "u16", extra.get("iq_scale", 1.0))
