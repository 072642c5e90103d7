"""On-chip probe: fused CT-order FFT + GCC pair kernels (run standalone).

Per the target-TPU protocol (CLAUDE.md): run in a fresh process via
nohup with a generous timeout; one UNIMPLEMENTED op poisons the whole
client session, so nothing else should share this process.

Usage: nohup python tools/probe_gcc_fused.py > /tmp/probe_gcc.log 2>&1 &
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("backend:", jax.default_backend(), jax.devices())

    from radio_mapper_tpu.ops.pallas import fft_kernel, gcc_kernel
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops.gcc_phat import pair_indices

    # ---- 1. CT-order forward at the flagship GCC length -----------------
    n = gcc_kernel.plan_nfft(16_384 + 512)  # tile-aligned flagship nfft
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, n)) + 1j * rng.normal(size=(8, n))
    t0 = time.time()
    fr, fi = fft_kernel.fft_rows_ct(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32)
    )
    fr, fi = np.asarray(fr), np.asarray(fi)
    want = np.fft.fft(x)[:, fft_kernel.ct_permutation(n)]
    err = np.max(np.abs((fr + 1j * fi) - want)) / np.abs(want).max()
    log(f"fft_rows_ct n={n}: compile+run {time.time()-t0:.1f}s, rel err {err:.2e}")
    if err > 1e-3:
        log("FAIL: fft_rows_ct numerics")
        return 1

    # ---- 2. fused pair kernel, flagship shape ---------------------------
    c, b, max_lag = 2, 8, 512
    sig = rng.normal(size=(c, b, n)).astype(np.float32)
    sg2 = rng.normal(size=(c, b, n)).astype(np.float32)
    fr, fi = fft_kernel.fft_rows_ct(jnp.asarray(sig), jnp.asarray(sg2))
    i_idx, j_idx = pair_indices(b)
    t0 = time.time()
    mags = np.asarray(
        gcc_kernel.gcc_pair_lag_mags(fr, fi, i_idx, j_idx, max_lag=max_lag)
    )
    log(f"gcc_pair_lag_mags: compile+run {time.time()-t0:.1f}s, shape {mags.shape}")

    # numeric check vs numpy on channel 0
    spec = np.fft.fft(sig[0] + 1j * sg2[0], n=n)  # natural order == same set
    okmax = 0.0
    for p, (i, j) in enumerate(zip(i_idx, j_idx)):
        r = spec[i] * np.conj(spec[j])
        m0 = np.abs(r)
        r = r / (m0 + 0.05 * m0.max() + 1e-30)
        corr = np.fft.ifft(r)
        wantw = np.abs(np.concatenate([corr[n - max_lag :], corr[: max_lag + 1]]))
        okmax = max(okmax, np.max(np.abs(mags[0, p] - wantw)) / wantw.max())
    log(f"pair kernel max rel err vs numpy: {okmax:.2e}")
    if okmax > 1e-2:
        log("FAIL: pair kernel numerics")
        return 1

    # ---- 3. time fused vs matmul full GCC at bench shape ----------------
    import functools

    ch, blk, lag = 32, 16_384, 512
    re = jnp.asarray(rng.normal(size=(ch, b, blk)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(ch, b, blk)).astype(np.float32))
    kw = dict(sample_rate_hz=2_400_000.0, max_lag=lag)

    def bench(fn, tag):
        f = jax.jit(fn)
        out = f(re, im)
        jax.block_until_ready(out)
        ts = []
        for _ in range(10):
            t0 = time.time()
            out = f(re, im)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        t = float(np.median(ts))
        log(f"{tag}: {t*1e3:.2f} ms/step  ({ch*b*blk/t/1e6:.0f} MS/s equiv)")
        return t, out

    t_mat, o_mat = bench(
        functools.partial(sc_ops.gcc_phat_all_pairs_split, **kw), "matmul GCC"
    )
    t_fus, o_fus = bench(
        functools.partial(sc_ops.gcc_phat_all_pairs_split_fused, **kw), "fused  GCC"
    )
    dlag = np.max(
        np.abs(np.asarray(o_mat.lag_samples) - np.asarray(o_fus.lag_samples))
    )
    log(f"lag agreement (noise-input argmax may differ): max |Δlag| {dlag}")
    log(f"speedup fused vs matmul: {t_mat/t_fus:.2f}x")
    log("PROBE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
