"""On-chip interleaved A/B: scan-K depth × pair_chunk tuning at 128 ch.

  A scan4/chunk32  — the r4 default (8.2-8.4 ms/block measured)
  B scan4/chunk64  — fewer spectra fetches, bigger inverse matmuls
  C scan8/chunk32  — halves the amortized dispatch floor again

Run fresh:  nohup python tools/probe_ab_tuning_r4.py > docs/probe_logs/ab_tuning_r4.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH, B, N, LAG = 128, 8, 16_384, 512
ITERS = 12
EPOCHS = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops.pallas import gcc_kernel
    from radio_mapper_tpu.utils.device import force_fetch

    log(f"backend={jax.default_backend()}")
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=B, block_len=N, sample_rate_hz=2_400_000.0,
            max_lag=LAG, max_peaks=8, solver_iterations=25,
        )
    )
    re, im, anchors = pipe.example_inputs(batch=(CH,), seed=0, split=True)
    anchors = jax.device_put(anchors)
    rng = np.random.default_rng(1)
    mk = lambda k: jax.device_put(
        rng.normal(size=(k, *re.shape)).astype(np.float32)
    )
    re4, im4 = mk(4), mk(4)
    re8, im8 = mk(8), mk(8)

    progs = []
    for name, chunk, k, args in (
        ("A s4/c32", 32, 4, (re4, im4, anchors)),
        ("B s4/c64", 64, 4, (re4, im4, anchors)),
        ("C s8/c32", 32, 8, (re8, im8, anchors)),
    ):
        gcc_kernel.set_default_pair_chunk(chunk)
        fn = jax.jit(lambda r, i, a, _n=name: pipe.step_split_scan(r, i, a))
        t0 = time.perf_counter()
        force_fetch(fn(*args))
        log(f"{name} compile+first {time.perf_counter()-t0:.1f}s")
        progs.append((name, fn, args, k))
    gcc_kernel.set_default_pair_chunk(32)

    times = {name: [] for name, *_ in progs}
    for e in range(EPOCHS):
        for name, fn, args, k in progs:
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(ITERS)]
            force_fetch(outs)
            dt = (time.perf_counter() - t0) / ITERS / k * 1e3
            times[name].append(dt)
            log(f"epoch {e} {name}: {dt:.2f} ms/block")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        log(f"{name}: median {med:.2f} ms/block = "
            f"{CH * B * N / med / 1e6:.0f} MS/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
