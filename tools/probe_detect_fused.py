"""On-chip probe: fused detect kernel — correctness + interleaved A/B.

Fresh-process protocol (docs/PROBES.md): run via
  nohup python tools/probe_detect_fused.py > docs/probe_logs/detect_fused.log 2>&1 &

Phase 1 (correctness): detect_ct_partials on synthetic CT spectra with
known injected peaks; compare candidates/noise floor vs a straightforward
numpy reimplementation of the natural-order semantics.

Phase 2 (perf): interleaved A/B of the detect STAGE at the 128-ch
flagship shape [1024 rows, nfft 17408] — fused kernel (detect_peaks_ct)
vs the r3 XLA stage (ct_power_db + detect_peaks, safe mode) — epochs of
chained dispatches closed by one derived-scalar fetch.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

NFFT = 17408  # flagship GCC length: n1=128, n2=136
FS = 2.4e6
THRESH = -10.0
ITERS = 20
EPOCHS = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def numpy_reference(fr, fi, *, radius=10, thresh=THRESH, notch_hz=10_000.0,
                    conf_floor=0.3, snr_s=20.0):
    """Natural-order detect semantics in numpy (f32 power, f64 tolerant)."""
    from radio_mapper_tpu.ops.pallas import fft_kernel

    n1, n2 = fft_kernel.ct_split(NFFT)
    p_ct = (fr.astype(np.float32) ** 2 + fi.astype(np.float32) ** 2)
    # CT → natural: natural[k2 + n2*k1] = ct[k2*n1 + k1]
    pn = np.transpose(p_ct.reshape(-1, n2, n1), (0, 2, 1)).reshape(-1, NFFT)
    pdb = 10.0 * np.log10(pn + 1e-24)
    nf = np.median(pdb[:, ::8], axis=-1)  # exact median ≈ bisected median
    ext = np.concatenate([pdb[:, -radius:], pdb, pdb[:, :radius]], axis=-1)
    smax = np.stack(
        [ext[:, i : i + 2 * radius + 1].max(-1) for i in range(NFFT)], axis=-1
    )
    cand = (pdb >= smax) & (pdb > thresh)
    freqs = np.fft.fftfreq(NFFT, d=1.0 / FS)
    cand &= np.abs(freqs)[None, :] >= notch_hz
    cand &= (pdb - nf[:, None]) >= conf_floor * snr_s
    return pn, pdb, nf, cand


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.ops import safe
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.utils.device import force_fetch

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    # ---------------- phase 1: correctness at a small batch
    rows = 16
    rng = np.random.default_rng(0)
    fr = rng.normal(scale=0.05, size=(rows, NFFT)).astype(np.float32)
    fi = rng.normal(scale=0.05, size=(rows, NFFT)).astype(np.float32)
    # inject well-separated spikes at NATURAL bins by writing the CT slot
    from radio_mapper_tpu.ops.pallas import fft_kernel

    n1, n2 = fft_kernel.ct_split(NFFT)
    spikes = [300, 471, 5000, NFFT - 800]
    for r in range(rows):
        for s, amp in zip(spikes, (9.0, 6.0, 4.0, 3.0)):
            k1, k2 = divmod(s, n2)
            fr[r, k2 * n1 + k1] = amp  # natural bin s lives at CT m=k2*n1+k1

    pn, pdb, nf_ref, cand_ref = numpy_reference(fr, fi)

    t0 = time.perf_counter()
    import functools

    part = jax.jit(functools.partial(
        detect_ops.detect_peaks_ct, sample_rate_hz=FS, max_peaks=8,
        threshold_db=THRESH,
    ))
    out = part(jnp.asarray(fr), jnp.asarray(fi))
    force_fetch(out)
    log(f"detect_peaks_ct compile+first {time.perf_counter()-t0:.1f}s")

    got_idx = np.asarray(out.bin_index)
    got_valid = np.asarray(out.valid)
    got_nf = np.asarray(out.noise_floor_db)
    nf_err = np.abs(got_nf - nf_ref).max()
    log(f"noise floor max |err| vs numpy-exact-median: {nf_err:.5f} dB")
    ok = nf_err < 0.05  # bisected vs exact median + f32: small
    for r in range(rows):
        found = set(got_idx[r][got_valid[r]])
        missing = [s for s in spikes if s not in found]
        if missing:
            log(f"row {r}: MISSING spikes {missing}; found {sorted(found)}")
            ok = False
    # candidate parity: every reported peak must be a numpy candidate
    for r in range(rows):
        for k in got_idx[r][got_valid[r]]:
            if not cand_ref[r, k]:
                log(f"row {r}: reported non-candidate bin {k}")
                ok = False
    log(f"phase 1 {'OK' if ok else 'FAIL'}")
    if not ok:
        return 1

    # ---------------- phase 2: interleaved A/B at the 128-ch shape
    rows = 128 * 8
    fr = rng.normal(scale=0.3, size=(rows, NFFT)).astype(np.float32)
    fi = rng.normal(scale=0.3, size=(rows, NFFT)).astype(np.float32)
    dfr, dfi = jax.device_put(fr), jax.device_put(fi)

    safe.set_safe_mode(True)

    def stage_fused(a, b):
        return detect_ops.detect_peaks_ct(
            a, b, sample_rate_hz=FS, max_peaks=8, threshold_db=THRESH
        )

    def stage_xla(a, b):
        power_db = sc_ops.ct_power_db(a, b)
        return detect_ops.detect_peaks(
            power_db, sample_rate_hz=FS, max_peaks=8, threshold_db=THRESH,
            noise_floor_stride=8,
        )

    jf = jax.jit(stage_fused)
    jx = jax.jit(stage_xla)
    for name, fn in (("fused", jf), ("xla", jx)):
        t0 = time.perf_counter()
        force_fetch(fn(dfr, dfi))
        log(f"{name} compile+first {time.perf_counter()-t0:.1f}s")

    # parity at full shape (valid peaks identical)
    of, ox = jf(dfr, dfi), jx(dfr, dfi)
    same = np.array_equal(
        np.asarray(of.bin_index)[np.asarray(of.valid)],
        np.asarray(ox.bin_index)[np.asarray(ox.valid)],
    ) and np.array_equal(np.asarray(of.valid), np.asarray(ox.valid))
    log(f"fused vs xla stage peak parity at 1024 rows: {same}")

    times = {"fused": [], "xla": []}
    for e in range(EPOCHS):
        for name, fn in (("fused", jf), ("xla", jx)):
            t0 = time.perf_counter()
            outs = [fn(dfr, dfi) for _ in range(ITERS)]
            force_fetch(outs)
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            times[name].append(dt)
            log(f"epoch {e} {name}: {dt:.2f} ms/stage")
    for name, ts in times.items():
        log(f"{name}: median {sorted(ts)[len(ts)//2]:.2f} ms (all {['%.2f'%t for t in ts]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
