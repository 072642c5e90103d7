"""ctypes bindings for the C++ host ingest library (native/libringest.so).

The native layer owns the byte-moving hot path on the host: a producer
thread pulls uint8 I/Q from file/TCP/synthetic sources into a lock-free
ring with nanosecond block timestamps and drop accounting — the TPU-host
equivalent of librtlsdr's async transfer engine
(`Code/src/librtlsdr.c:1769-1891`). Python drains fixed blocks and ships
them to the device.

Builds on demand with ``make -C native`` if the shared library is absent;
everything degrades to the pure-Python sources when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from radio_mapper_tpu.ingest.sources import IQSource

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libringest.so")

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _stale() -> bool:
    """True when the .so is missing or older than any native source file."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_NATIVE_DIR):
        if name.endswith((".cpp", ".hpp", ".h")):
            if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > lib_mtime:
                return True
    return False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if _stale() and not _build():
        raise NativeUnavailable(f"cannot build {_LIB_PATH} (no toolchain?)")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rmt_ingest_open_file.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t]
    lib.rmt_ingest_open_file.restype = ctypes.c_int
    lib.rmt_ingest_open_tcp.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t]
    lib.rmt_ingest_open_tcp.restype = ctypes.c_int
    lib.rmt_ingest_open_synthetic.argtypes = [ctypes.c_uint, ctypes.c_size_t, ctypes.c_size_t]
    lib.rmt_ingest_open_synthetic.restype = ctypes.c_int
    lib.rmt_ingest_open_synthetic_paced.argtypes = [
        ctypes.c_uint, ctypes.c_double, ctypes.c_size_t, ctypes.c_size_t,
    ]
    lib.rmt_ingest_open_synthetic_paced.restype = ctypes.c_int
    lib.rmt_ingest_read.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rmt_ingest_read.restype = ctypes.c_long
    lib.rmt_ingest_read_mt.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
    ]
    lib.rmt_ingest_read_mt.restype = ctypes.c_long
    lib.rmt_ingest_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rmt_ingest_stats.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int),
    ]
    lib.rmt_ingest_close.argtypes = [ctypes.c_int]
    _lib = lib
    return lib


class NativeIngest:
    """Low-level handle over the native ring."""

    def __init__(self, handle: int):
        if handle < 0:
            raise NativeUnavailable("native ingest open failed")
        self.handle = handle
        self.lib = load_library()

    @classmethod
    def open_file(cls, path: str, *, loop: bool = True, ring_bytes: int = 1 << 22, chunk_bytes: int = 1 << 16):
        lib = load_library()
        return cls(lib.rmt_ingest_open_file(path.encode(), int(loop), ring_bytes, chunk_bytes))

    @classmethod
    def open_tcp(cls, host: str, port: int, *, rtl_tcp_header: bool = True, ring_bytes: int = 1 << 22, chunk_bytes: int = 1 << 16):
        lib = load_library()
        return cls(lib.rmt_ingest_open_tcp(host.encode(), port, int(rtl_tcp_header), ring_bytes, chunk_bytes))

    @classmethod
    def open_synthetic(cls, seed: int = 0, *, ring_bytes: int = 1 << 22, chunk_bytes: int = 1 << 16):
        lib = load_library()
        return cls(lib.rmt_ingest_open_synthetic(seed, ring_bytes, chunk_bytes))

    @classmethod
    def open_synthetic_paced(
        cls, seed: int = 0, *, bytes_per_s: float,
        ring_bytes: int = 1 << 24, chunk_bytes: int = 1 << 16,
    ):
        """Synthetic source paced to a fixed byte rate (a virtual SDR
        clock): with pacing, ``stats()['bytes_dropped'] == 0`` is the
        real-time criterion (`Code/src/rtl_test.c:109-135`)."""
        lib = load_library()
        return cls(
            lib.rmt_ingest_open_synthetic_paced(
                seed, float(bytes_per_s), ring_bytes, chunk_bytes
            )
        )

    def read_bytes(self, nbytes: int, timeout_ms: int = 2000) -> Tuple[np.ndarray, int]:
        out = np.empty(nbytes, np.uint8)
        got, ts = self.read_into(out, timeout_ms)
        return out[:got], ts

    def read_into(
        self, out: np.ndarray, timeout_ms: int = 2000, *, threads: int = 0
    ) -> Tuple[int, int]:
        """Fill a caller-owned contiguous uint8 buffer from the ring.

        The zero-allocation hot path (VERDICT r3 item 2): the ingest loop
        reuses one pre-allocated destination per slot, and with
        ``threads > 1`` the ring→buffer memcpy runs as a parallel drain
        in C++ (`ring_buffer.hpp read_ranges`) — single-thread memcpy
        (~3 GB/s measured) falls ~4× short of the 256-channel aggregate
        byte rate. Returns ``(bytes_read, block_ts_ns)``.
        """
        # explicit raise (not assert): python -O would strip an assert and
        # a bad buffer would become a native out-of-bounds memcpy
        if out.dtype != np.uint8 or not out.flags["C_CONTIGUOUS"]:
            raise ValueError("read_into needs a C-contiguous uint8 buffer")
        ts = ctypes.c_int64(0)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if threads > 1:
            got = self.lib.rmt_ingest_read_mt(
                self.handle, ptr, out.size, timeout_ms, ctypes.byref(ts),
                int(threads),
            )
        else:
            got = self.lib.rmt_ingest_read(
                self.handle, ptr, out.size, timeout_ms, ctypes.byref(ts)
            )
        if got < 0:
            raise IOError("native ingest read failed")
        return int(got), int(ts.value)

    def decode(self, raw: np.ndarray, scale: float = 1.0) -> np.ndarray:
        raw = np.ascontiguousarray(raw, np.uint8)
        out = np.empty(raw.size, np.float32)
        self.lib.rmt_ingest_decode(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            raw.size,
            ctypes.c_float(scale),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def stats(self) -> dict:
        w = ctypes.c_uint64(0)
        d = ctypes.c_uint64(0)
        c = ctypes.c_uint64(0)
        e = ctypes.c_int(0)
        self.lib.rmt_ingest_stats(
            self.handle, ctypes.byref(w), ctypes.byref(d), ctypes.byref(c), ctypes.byref(e)
        )
        return {
            "bytes_written": w.value,
            "bytes_dropped": d.value,
            "bytes_consumed": c.value,
            "error": e.value,
        }

    def close(self):
        if self.handle >= 0:
            self.lib.rmt_ingest_close(self.handle)
            self.handle = -1

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeRingSource(IQSource):
    """IQSource backed by the native ring (file / rtl_tcp / synthetic)."""

    def __init__(
        self,
        ingest: NativeIngest,
        *,
        sample_rate_hz: float = 2_048_000.0,
        center_frequency_hz: float = 121.5e6,
    ):
        self.ingest = ingest
        self.sample_rate_hz = sample_rate_hz
        self.center_frequency_hz = center_frequency_hz
        self.last_block_ts_ns = 0

    def read(self, num_samples: int) -> np.ndarray:
        raw, ts = self.ingest.read_bytes(num_samples * 2)
        self.last_block_ts_ns = ts
        if raw.size < num_samples * 2:
            raw = np.pad(raw, (0, num_samples * 2 - raw.size), constant_values=127)
        f = self.ingest.decode(raw)
        return (f[0::2] + 1j * f[1::2]).astype(np.complex64)

    def close(self) -> None:
        self.ingest.close()
