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
