"""Flagship per-stage profile at the r5 defaults (128 ch × scan-16).

Where does the 5.0 ms/block live now that fwd+detect are one kernel and
the pair kernel runs reduction-free? Cumulative fetch-closed subgraphs:

  S1  combined FFT+detect kernel (+ partials top-K tail)
  S2  + fused pair stage (onehot/static-gather kernel + peak pick)
  S3  + pair weights
  full (= + batched LM solve, 25 iterations)
  full-lm12 (solver_iterations 12 — is the solve tail worth tuning?)

Run fresh:
  nohup python tools/probe_r5_flagstages.py > docs/probe_logs/ab_r5_flagstages.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH = 128
SCAN = 16


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def epoch(step, args, iters=10):
    from radio_mapper_tpu.utils.device import force_fetch

    out = step(*args)
    force_fetch(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    force_fetch(outs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu import constants
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.utils.device import force_fetch

    log(f"backend: {jax.default_backend()}")
    cfg = PipelineConfig(
        num_buoys=8, block_len=16_384, sample_rate_hz=2_400_000.0,
        max_lag=512, max_peaks=8, solver_iterations=25,
    )
    pipe = TDOAPipeline(cfg)
    re, im, anchors = pipe.example_inputs(batch=(CH,), seed=0, split=True)
    re1, im1 = jax.device_put((re, im))
    anc = jax.device_put(anchors)
    tile = jax.jit(lambda a: jnp.broadcast_to(a, (SCAN, *a.shape)) * 1.0)
    reK, imK = tile(re1), tile(im1)

    c = cfg

    def fwd_detect(r, i):
        ct_spectra, partials, row_smax = sc_ops.receiver_spectra_ct_detect(
            r, i, max_lag=c.max_lag,
            sample_rate_hz=c.sample_rate_hz,
            threshold_db=c.detection_threshold_db,
            min_distance_bins=constants.DEFAULT_PEAK_MIN_DISTANCE_BINS,
            dc_notch_hz=constants.DEFAULT_DC_NOTCH_HZ,
            confidence_floor=constants.DEFAULT_CONFIDENCE_FLOOR,
            snr_fullscale_db=constants.DEFAULT_SNR_FULLSCALE_DB,
            power_offset_db=c.power_offset_db,
            precision=sc_ops.gcc_forward_precision(c.weighting),
        )
        peaks = detect_ops.detect_peaks_ct(
            ct_spectra[0], ct_spectra[1],
            sample_rate_hz=c.sample_rate_hz, max_peaks=c.max_peaks,
            threshold_db=c.detection_threshold_db,
            power_offset_db=c.power_offset_db, partials=partials,
        )
        return ct_spectra, peaks, row_smax

    def s1(r, i, _a):
        ct, peaks, rmax = fwd_detect(r, i)
        return jax.tree.map(lambda a: a.sum(), (peaks, rmax))

    def s2(r, i, _a):
        ct, peaks, rmax = fwd_detect(r, i)
        corr = sc_ops.gcc_phat_all_pairs_split_fused(
            r, i, sample_rate_hz=c.sample_rate_hz, max_lag=c.max_lag,
            weighting=c.weighting, eps=c.gcc_eps, spectra=ct, row_smax=rmax,
        )
        return jax.tree.map(lambda a: a.sum(), (peaks, corr))

    def s3(r, i, _a):
        ct, peaks, rmax = fwd_detect(r, i)
        corr_sc = sc_ops.gcc_phat_all_pairs_split_fused(
            r, i, sample_rate_hz=c.sample_rate_hz, max_lag=c.max_lag,
            weighting=c.weighting, eps=c.gcc_eps, spectra=ct, row_smax=rmax,
        )
        from radio_mapper_tpu.ops import gcc_phat as gcc_ops

        corr = gcc_ops.CorrelationPeak(
            lag_samples=corr_sc.lag_samples, tau_s=corr_sc.tau_s,
            peak_value=corr_sc.peak_value, psr=corr_sc.psr,
        )
        w = pipe.pair_weights(peaks, corr)
        return jax.tree.map(lambda a: a.sum(), (w, corr.tau_s))

    def scanned(fn):
        @jax.jit
        def run(rK, iK, a):
            return jax.lax.scan(lambda cr, x: (cr, fn(x[0], x[1], a)), 0, (rK, iK))[1]
        return run

    stages = {"S1-fwd+detect": scanned(s1), "S2-+pair": scanned(s2),
              "S3-+weights": scanned(s3)}
    # full at 25 and 12 LM iterations (each needs its own pipeline object)
    stages["full-lm25"] = TDOAPipeline(cfg).jit_step_split_scan()
    stages["full-lm12"] = TDOAPipeline(
        PipelineConfig(**{**cfg.__dict__, "solver_iterations": 12})
    ).jit_step_split_scan()

    compiled = {}
    for name, st in stages.items():
        t0 = time.perf_counter()
        force_fetch(st(reK, imK, anc))
        log(f"  {name} compile+first {time.perf_counter()-t0:.1f}s")
        compiled[name] = st
    prof = {k: [] for k in compiled}
    for rnd in range(4):
        for name, st in compiled.items():
            prof[name].append(epoch(st, (reK, imK, anc), iters=8) / SCAN)
    for name, ts in prof.items():
        ts = sorted(ts)
        log(f"STAGE {name}: {ts[len(ts)//2]*1e3:.2f} ms/block")
    log("done")


if __name__ == "__main__":
    main()
