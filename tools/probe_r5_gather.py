"""On-chip A/B: dense pair kernel gather mode + chunk size (r5).

Hypothesis: the concat gather's 2·P [1, nfft] slice-products are
single-sublane values Mosaic lays out masked (~1/8 VPU utilization) —
the unexplained ~2 ms of the 3.0 ms pair stage. One-hot MXU dots
produce dense full-sublane X/Y blocks instead.

  A  concat gather (current), chunk 32, scan-16   (full flagship step)
  B  onehot gather, chunk 32, scan-16
  C  winner, chunk 16
Run fresh:
  nohup python tools/probe_r5_gather.py > docs/probe_logs/ab_r5_gather.log 2>&1 &
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

def build(gather, chunk):
    import jax, jax.numpy as jnp
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops.pallas import gcc_kernel
    from radio_mapper_tpu.utils.device import force_fetch
    gcc_kernel.set_pair_gather(gather)
    gcc_kernel.set_default_pair_chunk(chunk)
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
        gcc_kernel.set_pair_gather("concat")
        gcc_kernel.set_default_pair_chunk(32)

def main():
    import jax
    log(f"backend: {jax.default_backend()}")
    steps = {}
    for name, kw in (("A-concat-c32", ("concat", 32)), ("B-onehot-c32", ("onehot", 32))):
        log(f"build {name}")
        try:
            steps[name] = build(*kw)
        except Exception as e:
            log(f"  {name} FAILED: {e!r}"[:400])
    res = {k: [] for k in steps}
    for rnd in range(4):
        for name, (step, args) in steps.items():
            dt = epoch(step, args, iters=8) / SCAN
            res[name].append(dt)
            log(f"round {rnd} {name}: {dt*1e3:.2f} ms/block")
    med = {}
    for name, ts in res.items():
        ts = sorted(ts)
        med[name] = ts[len(ts)//2]
        log(f"MEDIAN {name}: {med[name]*1e3:.2f} ms/block")
    # winner at chunk 16
    win = min(med, key=med.get)
    gather = "onehot" if "onehot" in win else "concat"
    log(f"build C-{gather}-c16")
    try:
        stepc, argsc = build(gather, 16)
        d = []
        for rnd in range(3):
            dt = epoch(stepc, argsc, iters=8) / SCAN
            d.append(dt); log(f"round {rnd} C: {dt*1e3:.2f} ms/block")
        d.sort(); log(f"MEDIAN C-{gather}-c16: {d[len(d)//2]*1e3:.2f} ms/block")
    except Exception as e:
        log(f"  C FAILED: {e!r}"[:400])
    log("done")

if __name__ == "__main__":
    main()
