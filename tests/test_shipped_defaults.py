"""Pin the probe-validated defaults (r5).

Every routing/precision default below was chosen by an on-chip A/B
(docs/PROBES.md) — an accidental flip (e.g. a test forgetting to restore
a trace-time knob, or a refactor changing a literal) would silently ship
a slower or numerically different configuration. This module runs LAST
alphabetically-neutral but is order-independent: it reloads nothing and
reads the module constants, which setters must restore."""

import os
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_kernel_routing_defaults():
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops.pallas import channel_kernel, gcc_kernel

    # probed r4/r5 winners
    assert gcc_kernel._PHAT_GATE == "l2rx"
    assert gcc_kernel._PAIR_GATHER == "onehot"
    assert gcc_kernel.DEFAULT_PAIR_CHUNK == 32
    # probed-neutral features stay available but OFF
    assert channel_kernel._MEGA == "off"
    assert detect_ops._COMBINED_TOPK is False
    # auto routings
    assert sc_ops._GCC_FUSED == "auto"
    assert detect_ops._FUSED_DETECT == "auto"
    assert detect_ops._FUSED_FFT_DETECT == "auto"
    assert sc_ops._GCC_FWD_PRECISION is None
    assert sc_ops._GCC_GATHER_PRECISION is None


def test_precision_policies():
    import jax

    from radio_mapper_tpu.ops import fft as fft_ops
    from radio_mapper_tpu.ops import split_complex as sc_ops

    # PHAT chains: single-pass bf16 forward, inverse and gathers;
    # generic/cc keep the high-precision forms (probed τ parity ≤1e-2)
    assert sc_ops.gcc_forward_precision("phat") == "default"
    assert sc_ops.gcc_forward_precision("cc") is None
    assert sc_ops.gcc_gather_precision("phat") == jax.lax.Precision.DEFAULT
    assert sc_ops.gcc_gather_precision("cc") == jax.lax.Precision.HIGHEST
    assert fft_ops.get_precision() == jax.lax.Precision.HIGH  # bf16x3
    assert fft_ops.get_inverse_precision() == jax.lax.Precision.DEFAULT


def test_bench_scan_default():
    # depth-64 adopted late r5 (ab_r5_flag64: 4.81-4.87 -> 4.72 ms/block
    # both interleaved rounds; stacks clamped <=8.6 GB per channel count)
    src = (REPO / "bench.py").read_text()
    m = re.search(r'BENCH_SCAN_BLOCKS", "(\d+)"', src)
    assert m and m.group(1) == "64", m
