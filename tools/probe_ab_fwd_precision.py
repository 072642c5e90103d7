"""On-chip A/B: FORWARD-FFT precision in the fused flagship step.

r3 established the whitened INVERSE runs single-pass bf16 (PHAT flattens
dynamic range; τ parity 1.1e-5 samples). The forward transform kept
bf16x3 for its real dynamic range — but PHAT consumes only the PHASE of
the cross-spectrum, and per-bin bf16 phase noise (~2^-8 rad) averages
down across the thousands of bins the τ estimate integrates. If τ parity
holds, the forward drops 2/3 of its MXU passes.

  A scan8 + forward HIGH (bf16x3)   — r4 default
  B scan8 + forward DEFAULT (bf16)  — candidate

Parity: identical CORRELATED inputs (common signal, per-buoy integer
delays + noise), compare per-pair refined lags A vs B.

Run fresh: nohup python tools/probe_ab_fwd_precision.py > docs/probe_logs/ab_fwd_precision.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH, B, N, LAG = 128, 8, 16_384, 512
K = 8
ITERS = 12
EPOCHS = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import fft as fft_ops
    from radio_mapper_tpu.utils.device import force_fetch

    log(f"backend={jax.default_backend()}")
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=B, block_len=N, sample_rate_hz=2_400_000.0,
            max_lag=LAG, max_peaks=8, solver_iterations=25,
        )
    )
    rng = np.random.default_rng(0)
    # correlated inputs: common band-limited signal + per-buoy delay+noise
    s = rng.normal(size=(CH, 1, N)).astype(np.float32)
    delays = rng.integers(-80, 80, size=B)
    re = np.concatenate(
        [np.roll(s, int(d), axis=-1) for d in delays], axis=1
    ) + 0.3 * rng.normal(size=(CH, B, N)).astype(np.float32)
    im = np.concatenate(
        [np.roll(s, int(d), axis=-1) for d in delays], axis=1
    ) * 0.5 + 0.3 * rng.normal(size=(CH, B, N)).astype(np.float32)
    anchors = rng.normal(scale=8_000.0, size=(CH, B, 3)).astype(np.float32)
    anchors[..., 2] = 0.0
    reK = jax.device_put(np.broadcast_to(re, (K, *re.shape)).copy())
    imK = jax.device_put(np.broadcast_to(im, (K, *im.shape)).copy())
    anc = jax.device_put(anchors)

    from radio_mapper_tpu.ops import split_complex as sc_ops

    progs = []
    for name, prec in (("A fwd-bf16x3", "high"), ("B fwd-bf16", "default")):
        sc_ops.set_gcc_forward_precision(prec)
        fn = jax.jit(lambda r, i, a, _n=name: pipe.step_split_scan(r, i, a))
        t0 = time.perf_counter()
        out = fn(reK, imK, anc)
        force_fetch(out)
        log(f"{name} compile+first {time.perf_counter()-t0:.1f}s")
        peaks = jax.tree_util.tree_map(np.asarray, out.peaks)
        progs.append((name, fn, np.asarray(out.correlation.lag_samples), peaks))
    sc_ops.set_gcc_forward_precision(None)

    lagA, lagB = progs[0][2], progs[1][2]
    dmax = np.abs(lagA - lagB).max()
    log(f"tau parity: max |lag_A - lag_B| = {dmax:.2e} samples "
        f"(lag range ±{np.abs(lagA).max():.0f})")
    # detection parity: the detect stage consumes the SAME forward
    # spectra, so quantify what bf16 does to its outputs too
    pa, pb = progs[0][3], progs[1][3]
    va, vb = np.asarray(pa.valid), np.asarray(pb.valid)
    log(f"detect parity: valid sets equal={np.array_equal(va, vb)}, "
        f"bins equal={np.array_equal(np.asarray(pa.bin_index)[va], np.asarray(pb.bin_index)[vb]) if np.array_equal(va, vb) else 'n/a'}")
    both = va & vb
    log(f"detect power delta: max |Δpower_db|="
        f"{np.abs(np.asarray(pa.power_db)[both]-np.asarray(pb.power_db)[both]).max():.4f} dB, "
        f"max |Δnf|={np.abs(np.asarray(pa.noise_floor_db)-np.asarray(pb.noise_floor_db)).max():.4f} dB")

    times = {name: [] for name, *_ in progs}
    for e in range(EPOCHS):
        for name, fn, *_ in progs:
            t0 = time.perf_counter()
            outs = [fn(reK, imK, anc) for _ in range(ITERS)]
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
