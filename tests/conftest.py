"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (the standard pattern for
developing multi-host code on one machine).

Note: this environment's sitecustomize force-selects an experimental remote
TPU platform via ``jax.config.update("jax_platforms", "axon,cpu")`` at
interpreter start, which both ignores the JAX_PLATFORMS env var and makes
unit tests slow/flaky. We override the *config* (not the env var) back to
CPU before any backend initializes. Set RMT_TEST_PLATFORM to run the
numerics suite on real TPU hardware instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("RMT_TEST_PLATFORM", "cpu"))


# ---- trace-time knob hygiene -------------------------------------------
#
# Routing/precision knobs are module globals consulted at TRACE time; a
# test that flips one and fails before its `finally` would silently run
# the REST of the suite (and any later tracing) under non-default
# routing. This autouse session fixture asserts at teardown that every
# knob is back at its shipped default — a leak fails the run loudly.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _knob_leak_guard():
    yield
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.ops import fft as fft_ops
    from radio_mapper_tpu.ops import safe
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops.pallas import channel_kernel, gcc_kernel

    leaks = {
        name: val
        for name, val, want in (
            ("gcc_kernel._PHAT_GATE", gcc_kernel._PHAT_GATE, "l2rx"),
            ("gcc_kernel._PAIR_GATHER", gcc_kernel._PAIR_GATHER, "onehot"),
            ("gcc_kernel.DEFAULT_PAIR_CHUNK", gcc_kernel.DEFAULT_PAIR_CHUNK, 32),
            ("channel_kernel._MEGA", channel_kernel._MEGA, "off"),
            ("detect_ops._COMBINED_TOPK", detect_ops._COMBINED_TOPK, False),
            ("detect_ops._FUSED_DETECT", detect_ops._FUSED_DETECT, "auto"),
            ("detect_ops._FUSED_FFT_DETECT", detect_ops._FUSED_FFT_DETECT, "auto"),
            ("sc_ops._GCC_FUSED", sc_ops._GCC_FUSED, "auto"),
            ("sc_ops._GCC_FWD_PRECISION", sc_ops._GCC_FWD_PRECISION, None),
            ("sc_ops._GCC_GATHER_PRECISION", sc_ops._GCC_GATHER_PRECISION, None),
            ("safe._MODE", safe._MODE, None),
            ("fft_ops._BACKEND", fft_ops._BACKEND, "auto"),
        )
        if val != want
    }
    assert not leaks, f"tests leaked non-default trace-time knobs: {leaks}"
