"""One-process A/B: bf16x3 (3-pass) vs HIGHEST (6-pass) kernel matmuls.

The fused FFT/GCC kernels' dots honor ops.fft.set_precision at trace
time; HIGH now lowers to an explicit bf16x3 decomposition (Mosaic has no
native HIGH — see fft_kernel._dot_bf16x3). This probe times the FULL
flagship fused step both ways, interleaved A/B/A/B so tunnel drift
cancels, and checks τ parity between the two precisions. Also the
on-chip smoke test that Mosaic compiles bf16 casts + bf16×bf16→f32 dots
inside our kernels at all. Prints one JSON line.

Usage: nohup python tools/probe_ab_precision.py > /tmp/ab_prec.log 2>&1 &
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import fft as fft_ops
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
    # Replace the independent-noise blocks with genuinely correlated
    # receivers (one emitter waveform, integer per-buoy delays, light
    # receiver noise) so the τ parity number is a real sub-sample
    # comparison instead of a whitened-noise argmax lottery.
    rng = np.random.default_rng(7)
    base = rng.normal(size=(ch, 1, 16_384 + 128)).astype(np.float32)
    basei = rng.normal(size=(ch, 1, 16_384 + 128)).astype(np.float32)
    delays = np.arange(8) * 5
    re_np = np.stack([base[:, 0, 48 + d : 48 + 16_384 + d] for d in delays], axis=1)
    im_np = np.stack([basei[:, 0, 48 + d : 48 + 16_384 + d] for d in delays], axis=1)
    re_np += 0.05 * rng.normal(size=re_np.shape).astype(np.float32)
    im_np += 0.05 * rng.normal(size=im_np.shape).astype(np.float32)
    args = jax.device_put((re_np.astype(np.float32), im_np.astype(np.float32), anchors))

    sc_ops.set_gcc_fused("on")
    steps = {}
    outs = {}
    try:
        for mode in ("high", "highest"):
            fft_ops.set_precision(mode)
            t0 = time.time()

            # DISTINCT function identity per mode — jit caches by callable,
            # and the precision knob is trace-time only (docs/PROBES.md).
            def step_fn(re_, im_, a_, _mode=mode):
                return pipe.step_split(re_, im_, a_)

            f = jax.jit(step_fn)
            out = f(*args)
            jax.block_until_ready(out)
            print(f"# precision {mode}: compile+first {time.time()-t0:.1f}s", flush=True)
            steps[mode] = f
            outs[mode] = out
    finally:
        fft_ops.set_precision("high")
        sc_ops.set_gcc_fused("auto")

    def force(out_list):
        # block_until_ready does not span remote execution on this
        # backend (docs/PROBES.md); fetch a scalar depending on EVERY
        # output instead.
        import jax.numpy as jnp

        total = None
        for o in out_list:
            s = jnp.sum(o.correlation.lag_samples)
            total = s if total is None else total + s
        return float(np.asarray(total))

    times = {"high": [], "highest": []}
    for _ in range(6):
        for mode in ("high", "highest"):
            t0 = time.perf_counter()
            epoch_outs = [steps[mode](*args) for _ in range(5)]
            force(epoch_outs)
            times[mode].append((time.perf_counter() - t0) / 5)

    med = {m: float(np.median(ts)) for m, ts in times.items()}
    samples = ch * 8 * 16_384
    lag_diff = float(
        np.max(
            np.abs(
                np.asarray(outs["high"].correlation.lag_samples)
                - np.asarray(outs["highest"].correlation.lag_samples)
            )
        )
    )
    print(
        json.dumps(
            {
                "bf16x3_ms": round(med["high"] * 1e3, 3),
                "highest_ms": round(med["highest"] * 1e3, 3),
                "speedup_bf16x3": round(med["highest"] / med["high"], 3),
                "bf16x3_ms_per_epoch": [round(t * 1e3, 2) for t in times["high"]],
                "highest_ms_per_epoch": [round(t * 1e3, 2) for t in times["highest"]],
                "ms_per_s_bf16x3": round(samples / med["high"] / 1e6, 1),
                "max_lag_diff_samples": lag_diff,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
