"""One-process A/B: fused Pallas GCC pair stage vs XLA matmul path.

Times the FULL flagship step (detect + GCC + solve) with the pair stage
routed both ways, interleaved A/B/A/B so tunnel drift cancels — the only
trustworthy way to compare on a remote chip whose absolute speed swings
with tunnel state (docs/PROBES.md). Prints one JSON line.

Usage: nohup python tools/probe_ab_gcc.py > /tmp/ab_gcc.log 2>&1 &
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import split_complex as sc_ops

    print(f"# backend: {jax.default_backend()}", flush=True)
    ch = 32
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=8, block_len=16_384, sample_rate_hz=2_400_000.0,
            max_lag=512, max_peaks=8, solver_iterations=25,
        )
    )
    re, im, anchors = pipe.example_inputs(batch=(ch,), seed=0, split=True)
    args = jax.device_put((re, im, anchors))

    steps = {}
    outs = {}
    for mode in ("off", "on"):
        sc_ops.set_gcc_fused(mode)
        t0 = time.time()

        # DISTINCT function identity per mode: jax.jit of the same bound
        # method shares one compilation cache, and the routing flag is
        # trace-time only — a shared cache silently reuses the first
        # mode's trace (observed: identical outputs, 0.0 s "compile").
        def step_fn(re_, im_, a_, _mode=mode):
            return pipe.step_split(re_, im_, a_)

        f = jax.jit(step_fn)
        out = f(*args)
        jax.block_until_ready(out)
        print(f"# mode {mode}: compile+first {time.time()-t0:.1f}s", flush=True)
        steps[mode] = f
        outs[mode] = out
    sc_ops.set_gcc_fused("auto")

    # Interleaved timing epochs.
    times = {"off": [], "on": []}
    for _ in range(6):
        for mode in ("off", "on"):
            t0 = time.perf_counter()
            for _ in range(5):
                out = steps[mode](*args)
            jax.block_until_ready(out)
            times[mode].append((time.perf_counter() - t0) / 5)

    med = {m: float(np.median(ts)) for m, ts in times.items()}
    samples = ch * 8 * 16_384
    lag_diff = float(
        np.max(
            np.abs(
                np.asarray(outs["on"].correlation.lag_samples)
                - np.asarray(outs["off"].correlation.lag_samples)
            )
        )
    )
    print(
        json.dumps(
            {
                "matmul_ms": round(med["off"] * 1e3, 3),
                "fused_ms": round(med["on"] * 1e3, 3),
                "speedup_fused": round(med["off"] / med["on"], 3),
                "matmul_ms_per_epoch": [round(t * 1e3, 2) for t in times["off"]],
                "fused_ms_per_epoch": [round(t * 1e3, 2) for t in times["on"]],
                "ms_per_s_fused": round(samples / med["on"] / 1e6, 1),
                "max_lag_diff": lag_diff,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
