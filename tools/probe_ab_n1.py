"""On-chip A/B: CT factor n1=128 (nfft 17408) vs n1=256 (nfft 18432).

The pair stage's inner inverse dots are [m·n2, n1] × [n1, n1] — with
n1=128 the MXU contraction/width is a single 128-tile. n1=256 doubles
K and N per pass at the cost of ~6% more bins (18432 vs 17408) and a
bigger (n1+n2): 328 vs 264 → ~24% more matmul FLOPs. Question: does MXU
shape beat FLOP count? (Probe monkeypatches the planner; production
adopts only on a clear win.)

Run fresh: nohup python tools/probe_ab_n1.py > docs/probe_logs/ab_n1.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH, B, N, LAG, K = 128, 8, 16_384, 512, 16
ITERS = 10
EPOCHS = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops.pallas import fft_kernel, gcc_kernel
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
    # correlated signal for lag-parity checking
    rng = np.random.default_rng(0)
    s = rng.normal(size=(CH, 1, N)).astype(np.float32)
    delays = rng.integers(-80, 80, size=B)
    re = np.concatenate([np.roll(s, int(d), -1) for d in delays], 1) \
        + 0.3 * rng.normal(size=(CH, B, N)).astype(np.float32)
    im = 0.5 * np.concatenate([np.roll(s, int(d), -1) for d in delays], 1) \
        + 0.3 * rng.normal(size=(CH, B, N)).astype(np.float32)
    re1, im1 = jax.device_put((re, im))
    tile = jax.jit(lambda a: jnp.broadcast_to(a, (K, *a.shape)) * 1.0)
    reK, imK = tile(re1), tile(im1)

    orig_split = fft_kernel.ct_split
    orig_plan = gcc_kernel.plan_nfft

    def patched_split(n):
        if n == 18432:
            return (256, 72)
        return orig_split(n)

    progs = []
    for name, n1 in (("A n1=128", 128), ("B n1=256", 256)):
        if n1 == 256:
            fft_kernel.ct_split = patched_split
            gcc_kernel.plan_nfft = lambda m: 18432 if m <= 18432 else orig_plan(m)
        else:
            fft_kernel.ct_split = orig_split
            gcc_kernel.plan_nfft = orig_plan
        fn = jax.jit(lambda r, i, a, _n=name: pipe.step_split_scan(r, i, a))
        t0 = time.perf_counter()
        out = fn(reK, imK, anchors)
        force_fetch(out)
        log(f"{name} compile+first {time.perf_counter()-t0:.1f}s")
        progs.append((name, fn, np.asarray(out.correlation.lag_samples)))
    fft_kernel.ct_split = orig_split
    gcc_kernel.plan_nfft = orig_plan

    d = np.abs(progs[0][2] - progs[1][2]).max()
    log(f"lag parity across nfft plans: max delta {d:.4f} samples")

    times = {name: [] for name, *_ in progs}
    for e in range(EPOCHS):
        for name, fn, _l in progs:
            t0 = time.perf_counter()
            outs = [fn(reK, imK, anchors) for _ in range(ITERS)]
            force_fetch(outs)
            dt = (time.perf_counter() - t0) / ITERS / K * 1e3
            times[name].append(dt)
            log(f"epoch {e} {name}: {dt:.2f} ms/block")
    for name, ts in times.items():
        log(f"{name}: median {sorted(ts)[len(ts)//2]:.2f} ms/block")
    return 0


if __name__ == "__main__":
    sys.exit(main())
