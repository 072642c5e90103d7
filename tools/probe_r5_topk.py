"""On-chip A/B: in-kernel top-K in the COMBINED FFT+detect kernel.

r4 probed in-kernel top-K NEUTRAL for the standalone detect kernel; the
combined kernel raises the stakes (partials write + XLA top-K traffic
is a bigger relative share of a 4.8 ms block). Full flagship step,
128 ch x scan-16, interleaved.

Run fresh:
  nohup python tools/probe_r5_topk.py > docs/probe_logs/ab_r5_topk.log 2>&1 &
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
CH, SCAN = 128, 16

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

def epoch(step, args, iters=10):
    from radio_mapper_tpu.utils.device import force_fetch
    out = step(*args); force_fetch(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    force_fetch(outs)
    return (time.perf_counter() - t0) / iters

def build(topk: bool):
    import jax, jax.numpy as jnp
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.utils.device import force_fetch
    detect_ops.set_combined_topk(topk)
    try:
        pipe = TDOAPipeline(PipelineConfig(
            num_buoys=8, block_len=16_384, sample_rate_hz=2_400_000.0,
            max_lag=512, max_peaks=8, solver_iterations=25,
        ))
        re, im, anchors = pipe.example_inputs(batch=(CH,), seed=0, split=True)
        re1, im1 = jax.device_put((re, im))
        tile = jax.jit(lambda a: jnp.broadcast_to(a, (SCAN, *a.shape)) * 1.0)
        args = (tile(re1), tile(im1), jax.device_put(anchors))
        step = pipe.jit_step_split_scan()
        t0 = time.perf_counter()
        force_fetch(step(*args))
        log(f"  compile+first {time.perf_counter()-t0:.1f}s")
        return step, args
    finally:
        detect_ops.set_combined_topk(False)

def main():
    import jax
    log(f"backend: {jax.default_backend()}")
    steps = {}
    for name, topk in (("A-xla-topk", False), ("B-kernel-topk", True)):
        log(f"build {name}")
        try:
            steps[name] = build(topk)
        except Exception as e:
            log(f"  {name} FAILED: {e!r}"[:400])
    res = {k: [] for k in steps}
    for rnd in range(4):
        for name, (step, args) in steps.items():
            dt = epoch(step, args, iters=8) / SCAN
            res[name].append(dt)
            log(f"round {rnd} {name}: {dt*1e3:.2f} ms/block")
    for name, ts in res.items():
        ts = sorted(ts)
        log(f"MEDIAN {name}: {ts[len(ts)//2]*1e3:.2f} ms/block")
    log("done")

if __name__ == "__main__":
    main()
