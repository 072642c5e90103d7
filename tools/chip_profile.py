"""Per-stage on-chip cost breakdown of the flagship fused step.

VERDICT r2 item 2: nobody can optimize what isn't measured per-stage.
Isolates, at the bench's headline shape (default 128 ch × 8 × 16384,
max_lag 512, fused-GCC routing):

    dispatch floor      — trivial program, chained (per-dispatch overhead)
    forward CT-FFT      — fft_rows_ct over all receiver rows
    detect              — CT power un-permute + median floor + top-k
    fused pair stage    — whiten × inverse × lag-window Pallas kernel
                          (given precomputed spectra)
    solve               — LM scan
    FULL step           — everything (the bench program)

Methodology (docs/PROBES.md): per-call sync is unreliable on the remote
backend, so each timing is an epoch of chained dispatches closed by ONE
derived-scalar fetch; stages are timed round-robin over several rounds so
tunnel drift cancels in the ranking; median per stage is reported.

Run:  nohup python tools/chip_profile.py > /tmp/chip_profile.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(num_channels=128, num_buoys=8, block_len=16_384, max_lag=512,
         iters=20, rounds=3):
    import jax

    from radio_mapper_tpu import solver
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.ops import split_complex as sc_ops

    print(f"# backend: {jax.default_backend()}", flush=True)
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=num_buoys, block_len=block_len,
            sample_rate_hz=2_400_000.0, max_lag=max_lag, solver_iterations=25,
        )
    )
    c = pipe.config
    re, im, anchors = pipe.example_inputs(batch=(num_channels,), seed=0, split=True)
    re, im, anchors = jax.device_put((re, im, anchors))
    samples = num_channels * num_buoys * block_len

    from radio_mapper_tpu.utils.device import force_fetch as force

    # --- stage programs (compile once each) -----------------------------
    fused = sc_ops.gcc_fused_enabled(block_len + max_lag, c.weighting)
    print(f"# fused routing: {fused}", flush=True)

    def fwd_ct(re, im):
        return sc_ops.receiver_spectra_ct(
            re, im, max_lag=c.max_lag,
            precision=sc_ops.gcc_forward_precision(c.weighting),
        )[:2]

    def detect_from_ct(fr, fi):
        # the r3 XLA formulation, kept as the comparison row
        power_db = sc_ops.ct_power_db(fr, fi) + c.power_offset_db
        return detect_ops.detect_peaks(
            power_db, sample_rate_hz=c.sample_rate_hz, max_peaks=c.max_peaks,
            noise_floor_stride=c.noise_floor_stride,
        )

    def detect_fused_ct(fr, fi):
        # the r4 default: fused Pallas detect kernel
        return detect_ops.detect_peaks_ct(
            fr, fi, sample_rate_hz=c.sample_rate_hz, max_peaks=c.max_peaks,
            threshold_db=c.detection_threshold_db,
            power_offset_db=c.power_offset_db,
        )

    def pair_from_ct(re, im, fr, fi):
        from radio_mapper_tpu.ops.pallas import gcc_kernel

        nfft = gcc_kernel.plan_nfft(block_len + max_lag)
        return sc_ops.gcc_phat_all_pairs_split_fused(
            re, im, sample_rate_hz=c.sample_rate_hz, max_lag=c.max_lag,
            weighting=c.weighting, eps=c.gcc_eps, spectra=(fr, fi, nfft),
        )

    def dispatch_floor(x):
        return x + 1.0

    stages = {}
    t0 = time.time()
    tiny = jax.device_put(np.zeros((8, 128), np.float32))
    floor_fn = jax.jit(dispatch_floor)
    force(floor_fn(tiny))
    stages["dispatch_floor"] = (floor_fn, (tiny,))
    print(f"# floor compile {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    fwd_fn = jax.jit(fwd_ct)
    fr, fi = fwd_fn(re, im)
    force((fr, fi))
    stages["forward_ct_fft"] = (fwd_fn, (re, im))
    print(f"# forward compile {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    det_fn = jax.jit(detect_from_ct)
    force(det_fn(fr, fi))
    stages["detect_xla"] = (det_fn, (fr, fi))
    print(f"# detect-xla compile {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    detf_fn = jax.jit(detect_fused_ct)
    force(detf_fn(fr, fi))
    stages["detect_fused"] = (detf_fn, (fr, fi))
    print(f"# detect-fused compile {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    pair_fn = jax.jit(pair_from_ct)
    corr = pair_fn(re, im, fr, fi)
    force(corr)
    stages["fused_pair_stage"] = (pair_fn, (re, im, fr, fi))
    print(f"# pair compile {time.time()-t0:.1f}s", flush=True)

    dd = jax.device_put(
        np.asarray(solver.tau_to_distance_difference(corr.tau_s), np.float32)
    )

    def solve_only(dd, anchors):
        return solver.solve_tdoa(
            anchors, pipe.pair_i, pipe.pair_j, dd, iterations=c.solver_iterations
        )

    t0 = time.time()
    solve_fn = jax.jit(solve_only)
    force(solve_fn(dd, anchors))
    stages["solve_lm"] = (solve_fn, (dd, anchors))
    print(f"# solve compile {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    full_fn = pipe.jit_step_split()
    force(full_fn(re, im, anchors))
    stages["FULL_step"] = (full_fn, (re, im, anchors))
    print(f"# full compile {time.time()-t0:.1f}s", flush=True)

    # scan-16 production program; per-block time = epoch/16
    import jax.numpy as jnp

    K = 16
    tile = jax.jit(lambda a: jnp.broadcast_to(a, (K, *a.shape)) * 1.0)
    reK, imK = tile(re), tile(im)
    t0 = time.time()
    scan_fn = pipe.jit_step_split_scan()
    force(scan_fn(reK, imK, anchors))
    stages[f"FULL_scan{K}"] = (scan_fn, (reK, imK, anchors), K)
    print(f"# scan{K} compile {time.time()-t0:.1f}s", flush=True)

    # --- round-robin fetch-closed timing --------------------------------
    times = {k: [] for k in stages}
    for _ in range(rounds):
        for name, entry in stages.items():
            fn, args = entry[0], entry[1]
            blocks = entry[2] if len(entry) > 2 else 1
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            force(outs[-1])  # chained dispatches serialize on-device
            times[name].append((time.perf_counter() - t0) / iters / blocks)

    result = {}
    for name, ts in times.items():
        ms = float(np.median(ts)) * 1e3
        result[name] = round(ms, 3)
        print(
            f"{name:20s} {ms:8.2f} ms/step   {samples/(ms/1e3)/1e6:9.1f} MS/s  "
            f"(epochs {[round(t*1e3,2) for t in ts]})",
            flush=True,
        )
    result.update(
        channels=num_channels, buoys=num_buoys, block_len=block_len,
        max_lag=max_lag, iters=iters,
        backend=jax.default_backend(),
    )
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
