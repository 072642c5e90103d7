"""On-chip A/B: in-kernel detect top-K vs two-stage partials+XLA top-k.

  A scan8 + kernel_topk (r4 candidate default)
  B scan8 + partials + safe.top_k stage 2 (previous r4 state)

Run fresh: nohup python tools/probe_ab_topk.py > docs/probe_logs/ab_topk.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH, B, N, LAG, K = 128, 8, 16_384, 512, 8
ITERS = 12
EPOCHS = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

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
    anchors = jax.device_put(anchors)
    rng = np.random.default_rng(1)
    mk = lambda: jax.device_put(
        rng.normal(size=(K, *re.shape)).astype(np.float32)
    )
    reK, imK = mk(), mk()

    import radio_mapper_tpu.ops.detect as dmod

    orig = dmod.detect_peaks_ct
    progs = []
    for name, topk in (("A kernel-topk", True), ("B two-stage", False)):
        def patched(*a, _t=topk, **kw):
            kw["kernel_topk"] = _t
            return orig(*a, **kw)
        dmod.detect_peaks_ct = patched
        fn = jax.jit(lambda r, i, a, _n=name: pipe.step_split_scan(r, i, a))
        t0 = time.perf_counter()
        out = fn(reK, imK, anchors)
        force_fetch(out)
        log(f"{name} compile+first {time.perf_counter()-t0:.1f}s")
        progs.append((name, fn, np.asarray(out.peaks.bin_index),
                      np.asarray(out.peaks.valid)))
    dmod.detect_peaks_ct = orig

    same = np.array_equal(progs[0][2][progs[0][3]], progs[1][2][progs[1][3]]) \
        and np.array_equal(progs[0][3], progs[1][3])
    log(f"peak parity A vs B: {same}")

    times = {name: [] for name, *_ in progs}
    for e in range(EPOCHS):
        for name, fn, _b, _v in progs:
            t0 = time.perf_counter()
            outs = [fn(reK, imK, anchors) for _ in range(ITERS)]
            force_fetch(outs)
            dt = (time.perf_counter() - t0) / ITERS / K * 1e3
            times[name].append(dt)
            log(f"epoch {e} {name}: {dt:.2f} ms/block")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        log(f"{name}: median {med:.2f} ms/block")
    return 0


if __name__ == "__main__":
    sys.exit(main())
