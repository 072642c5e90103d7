"""On-chip interleaved A/B: full flagship step at 128 ch — r4 routings.

Programs (each compiled once, epochs interleaved A/B/C so tunnel drift
cancels; fetch-closed timing per docs/PROBES.md):

  A "r3"    — step_split with fused GCC but the XLA detect stage
              (set_fused_detect off): the round-3 default.
  B "fused" — step_split with the fused detect kernel (r4 default).
  C "scan4" — step_split_scan over K=4 blocks in ONE dispatch (per-block
              time = epoch/4; measures the dispatch-floor amortization,
              VERDICT r3 item 4).
  floor     — trivial program; the per-dispatch floor.

Run fresh:  nohup python tools/probe_ab_step_r4.py > docs/probe_logs/ab_step_r4.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH, B, N, LAG = 128, 8, 16_384, 512
ITERS = 20
EPOCHS = 3
K = 4


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.utils.device import force_fetch

    log(f"backend={jax.default_backend()}")
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=B, block_len=N, sample_rate_hz=2_400_000.0,
            max_lag=LAG, max_peaks=8, solver_iterations=25,
        )
    )
    re, im, anchors = pipe.example_inputs(batch=(CH,), seed=0, split=True)
    re, im, anchors = jax.device_put((re, im, anchors))

    # distinct defs per routing: jit caches are shared per callable
    detect_ops.set_fused_detect("off")
    step_r3 = jax.jit(lambda r, i, a: pipe.step_split(r, i, a))
    t0 = time.perf_counter()
    force_fetch(step_r3(re, im, anchors))
    log(f"A r3(detect=xla) compile+first {time.perf_counter()-t0:.1f}s")

    detect_ops.set_fused_detect("auto")
    step_fused = jax.jit(lambda r, i, a: pipe.step_split(r, i, a))
    t0 = time.perf_counter()
    force_fetch(step_fused(re, im, anchors))
    log(f"B fused-detect compile+first {time.perf_counter()-t0:.1f}s")

    re4 = jnp.broadcast_to(re, (K, *re.shape))
    im4 = jnp.broadcast_to(im, (K, *im.shape))
    step_scan = jax.jit(lambda r, i, a: pipe.step_split_scan(r, i, a))
    t0 = time.perf_counter()
    force_fetch(step_scan(re4, im4, anchors))
    log(f"C scan{K} compile+first {time.perf_counter()-t0:.1f}s")

    floor_fn = jax.jit(lambda r: jnp.sum(r[:2, :2, :128]) * 2.0)
    force_fetch(floor_fn(re))

    progs = [
        ("A r3   ", step_r3, (re, im, anchors), 1),
        ("B fused", step_fused, (re, im, anchors), 1),
        ("C scan4", step_scan, (re4, im4, anchors), K),
    ]
    times = {name: [] for name, *_ in progs}
    floor_ts = []
    for e in range(EPOCHS):
        for name, fn, args, blocks in progs:
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(ITERS)]
            force_fetch(outs)
            dt = (time.perf_counter() - t0) / ITERS / blocks * 1e3
            times[name].append(dt)
            log(f"epoch {e} {name}: {dt:.2f} ms/block")
        t0 = time.perf_counter()
        outs = [floor_fn(re) for _ in range(ITERS)]
        force_fetch(outs)
        floor_ts.append((time.perf_counter() - t0) / ITERS * 1e3)
        log(f"epoch {e} floor  : {floor_ts[-1]:.2f} ms/dispatch")

    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        rate = CH * B * N / (med * 1e-3) / 1e9
        log(f"{name}: median {med:.2f} ms/block = {rate:.2f} GS/s "
            f"(all {['%.2f' % t for t in ts]})")
    fmed = sorted(floor_ts)[len(floor_ts) // 2]
    smed = sorted(times["C scan4"])[len(times["C scan4"]) // 2]
    log(f"floor: median {fmed:.2f} ms → scan{K} floor share "
        f"{fmed / K / smed * 100:.1f}% (single-block share "
        f"{fmed / sorted(times['B fused'])[1] * 100:.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
