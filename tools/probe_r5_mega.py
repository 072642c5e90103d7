"""On-chip A/B: flagship megakernel vs the two-kernel r5 routing.

  A  combined FFT+detect kernel + pair kernel (r5 default so far), scan-16
  B  megakernel (FFT x detect x GCC one pass), scan-16
  C  megakernel, scan-32

Run fresh:
  nohup python tools/probe_r5_mega.py > docs/probe_logs/ab_r5_mega.log 2>&1 &
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

CH = 128

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

def epoch(step, args, iters=10):
    from radio_mapper_tpu.utils.device import force_fetch
    out = step(*args); force_fetch(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    force_fetch(outs)
    return (time.perf_counter() - t0) / iters

def build(mega: bool, scan: int):
    import jax, jax.numpy as jnp
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops.pallas import channel_kernel
    from radio_mapper_tpu.utils.device import force_fetch
    channel_kernel.set_mega_fused("on" if mega else "off")
    try:
        pipe = TDOAPipeline(PipelineConfig(
            num_buoys=8, block_len=16_384, sample_rate_hz=2_400_000.0,
            max_lag=512, max_peaks=8, solver_iterations=25,
        ))
        re, im, anchors = pipe.example_inputs(batch=(CH,), seed=0, split=True)
        re1, im1 = jax.device_put((re, im))
        tile = jax.jit(lambda a: jnp.broadcast_to(a, (scan, *a.shape)) * 1.0)
        args = (tile(re1), tile(im1), jax.device_put(anchors))
        step = pipe.jit_step_split_scan()
        t0 = time.perf_counter()
        force_fetch(step(*args))
        log(f"  compile+first {time.perf_counter()-t0:.1f}s")
        return step, args, scan
    finally:
        channel_kernel.set_mega_fused("auto")

def main():
    import jax
    log(f"backend: {jax.default_backend()}")
    steps = {}
    for name, (mega, scan) in (
        ("A-twokernel-s16", (False, 16)),
        ("B-mega-s16", (True, 16)),
        ("C-mega-s32", (True, 32)),
    ):
        log(f"build {name}")
        try:
            steps[name] = build(mega, scan)
        except Exception as e:
            log(f"  {name} FAILED: {e!r}"[:500])
    res = {k: [] for k in steps}
    for rnd in range(4):
        for name, (step, args, scan) in steps.items():
            dt = epoch(step, args, iters=8 if scan == 16 else 5) / scan
            res[name].append(dt)
            log(f"round {rnd} {name}: {dt*1e3:.2f} ms/block")
    for name, ts in res.items():
        ts = sorted(ts)
        log(f"MEDIAN {name}: {ts[len(ts)//2]*1e3:.2f} ms/block")
    log("done")

if __name__ == "__main__":
    main()
