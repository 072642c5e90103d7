"""On-chip A/B: scan depth 8 vs 16, and detect-kernel rows_per_block 8 vs 16.

Run fresh: nohup python tools/probe_ab_depth_rows.py > docs/probe_logs/ab_depth_rows.log 2>&1 &
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH, B, N, LAG = 128, 8, 16_384, 512
ITERS = 10
EPOCHS = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops.pallas import detect_kernel
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

    progs = []
    for name, k in (("A scan8 ", 8), ("B scan16", 16)):
        rK, iK = mk(k), mk(k)
        fn = jax.jit(lambda r, i, a, _n=name: pipe.step_split_scan(r, i, a))
        t0 = time.perf_counter()
        force_fetch(fn(rK, iK, anchors))
        log(f"{name} compile+first {time.perf_counter()-t0:.1f}s")
        progs.append((name, fn, (rK, iK, anchors), k))

    # detect stage standalone: rows_per_block 8 vs 16
    nfft = 17408
    fr = jax.device_put(rng.normal(size=(CH * B, nfft)).astype(np.float32))
    fi = jax.device_put(rng.normal(size=(CH * B, nfft)).astype(np.float32))
    for name, rows in (("C det-r8 ", 8), ("D det-r16", 16)):
        fn = jax.jit(functools.partial(
            detect_kernel.detect_ct_partials,
            sample_rate_hz=2.4e6, threshold_db=-10.0, min_distance_bins=10,
            dc_notch_hz=10_000.0, confidence_floor=0.3, snr_fullscale_db=20.0,
            rows_per_block=rows,
        ))
        t0 = time.perf_counter()
        force_fetch(fn(fr, fi))
        log(f"{name} compile+first {time.perf_counter()-t0:.1f}s")
        progs.append((name, fn, (fr, fi), 1))

    times = {name: [] for name, *_ in progs}
    for e in range(EPOCHS):
        for name, fn, args, k in progs:
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(ITERS)]
            force_fetch(outs)
            dt = (time.perf_counter() - t0) / ITERS / k * 1e3
            times[name].append(dt)
            log(f"epoch {e} {name}: {dt:.2f} ms")
    for name, ts in times.items():
        log(f"{name}: median {sorted(ts)[len(ts)//2]:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
