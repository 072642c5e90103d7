"""On-chip A/B: pair-stage channel packing + detect bisect depth.

The r5 flagship profile puts the pair stage at ~3.0 ms vs a ~0.9 ms
arithmetic floor — suspect per-grid-cell overheads (128 one-channel
cells per scan iter). Packing 2 channels per cell (reshape [c, b, nfft]
→ [c/2, 2b, nfft] + an offset pair table — ZERO kernel changes) halves
cells and doubles matmul free dims, at the cost of ~2× live VMEM.

  P1  pair stage 1 ch/cell (current)         — stage-only, 128 ch
  P2  pair stage 2 ch/cell                   — stage-only
  D24/D16  combined fwd+detect kernel, bisect_iters 24 vs 16

Run fresh:
  nohup python tools/probe_r5_pair2ch.py > docs/probe_logs/ab_r5_pair2ch.log 2>&1 &
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

CH, B, N, LAG = 128, 8, 16_384, 512

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

def epoch(step, args, iters=12):
    from radio_mapper_tpu.utils.device import force_fetch
    out = step(*args); force_fetch(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    force_fetch(outs)
    return (time.perf_counter() - t0) / iters

def main():
    import jax, jax.numpy as jnp
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops.gcc_phat import pair_indices
    from radio_mapper_tpu.ops.pallas import gcc_kernel
    from radio_mapper_tpu.utils.device import force_fetch

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    re = rng.normal(size=(CH, B, N)).astype(np.float32)
    im = rng.normal(size=(CH, B, N)).astype(np.float32)
    re, im = jax.device_put((jnp.asarray(re), jnp.asarray(im)))
    i_idx, j_idx = pair_indices(B)
    p = len(i_idx)
    i2 = np.concatenate([i_idx, i_idx + B])
    j2 = np.concatenate([j_idx, j_idx + B])

    def spectra(r, i):
        return sc_ops.receiver_spectra_ct(r, i, max_lag=LAG, precision="default")

    def pair1(r, i):
        fr, fi, _ = spectra(r, i)
        rmax = jnp.max(fr * fr + fi * fi, axis=-1)
        return gcc_kernel.gcc_pair_lag_mags(
            fr, fi, i_idx, j_idx, max_lag=LAG, row_smax=rmax
        ).sum()

    def pair2(r, i):
        fr, fi, nf = spectra(r, i)
        fr2 = fr.reshape(CH // 2, 2 * B, nf)
        fi2 = fi.reshape(CH // 2, 2 * B, nf)
        rmax = jnp.max(fr2 * fr2 + fi2 * fi2, axis=-1)
        return gcc_kernel.gcc_pair_lag_mags(
            fr2, fi2, i2, j2, max_lag=LAG, pair_chunk=2 * p,
            row_smax=rmax,
        ).sum()

    steps = {}
    for name, fn in (("P1-1ch", pair1), ("P2-2ch", pair2)):
        st = jax.jit(fn)
        try:
            t0 = time.perf_counter()
            force_fetch(st(re, im))
            log(f"  {name} compile+first {time.perf_counter()-t0:.1f}s")
            steps[name] = st
        except Exception as e:
            log(f"  {name} FAILED: {e!r}"[:400])

    # detect bisect depth on the combined kernel
    from radio_mapper_tpu import constants
    from radio_mapper_tpu.ops.pallas import detect_kernel, gcc_kernel as gk

    nfft = gk.plan_nfft(N + LAG)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, nfft - N)))
    rp, ip = jax.device_put((pad(re), pad(im)))
    det = dict(
        sample_rate_hz=2.4e6, threshold_db=-70.0,
        min_distance_bins=constants.DEFAULT_PEAK_MIN_DISTANCE_BINS,
        dc_notch_hz=constants.DEFAULT_DC_NOTCH_HZ,
        confidence_floor=constants.DEFAULT_CONFIDENCE_FLOOR,
        snr_fullscale_db=constants.DEFAULT_SNR_FULLSCALE_DB,
    )
    for iters_b in (24, 16):
        name = f"D{iters_b}"
        def fn(r, i, nb=iters_b):
            out = detect_kernel.fft_detect_rows_ct(
                r, i, **det, bisect_iters=nb, precision="default"
            )
            return sum(o.sum() for o in out)
        st = jax.jit(fn)
        t0 = time.perf_counter()
        force_fetch(st(rp, ip))
        log(f"  {name} compile+first {time.perf_counter()-t0:.1f}s")
        steps[name] = (st, (rp, ip))

    res = {k: [] for k in steps}
    for rnd in range(4):
        for name, st in steps.items():
            if isinstance(st, tuple):
                dt = epoch(st[0], st[1])
            else:
                dt = epoch(st, (re, im))
            res[name].append(dt)
            log(f"round {rnd} {name}: {dt*1e3:.2f} ms")
    for name, ts in res.items():
        ts = sorted(ts)
        log(f"MEDIAN {name}: {ts[len(ts)//2]*1e3:.2f} ms")
    log("done")

if __name__ == "__main__":
    main()
