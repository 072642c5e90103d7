"""On-chip probe #2: where does the CT-kernel compile time go?

Times Mosaic compiles for the natural fused FFT vs the CT-order variant
at aligned (16384 = 128·128) and sublane-odd (17408 = 128·136) lengths,
then the end-to-end fused vs matmul GCC at the flagship shape.

Usage: nohup python tools/probe_ct_compile.py > /tmp/probe_ct.log 2>&1 &
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("backend:", jax.default_backend())

    from radio_mapper_tpu.ops.pallas import fft_kernel

    rng = np.random.default_rng(0)

    def timeit(tag, fn):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        log(f"{tag}: compile+first-run {time.time()-t0:.1f}s")
        return out

    x16 = rng.normal(size=(8, 16384)).astype(np.float32)
    y16 = rng.normal(size=(8, 16384)).astype(np.float32)
    timeit("fft_rows natural n=16384", lambda: fft_kernel.fft_rows(
        jnp.asarray(x16), jnp.asarray(y16)))
    timeit("fft_rows_ct n=16384", lambda: fft_kernel.fft_rows_ct(
        jnp.asarray(x16), jnp.asarray(y16)))

    # End-to-end fused vs matmul GCC at flagship shape.
    import functools

    from radio_mapper_tpu.ops import split_complex as sc_ops

    ch, b, blk, lag = 32, 8, 16_384, 512
    re = jnp.asarray(rng.normal(size=(ch, b, blk)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(ch, b, blk)).astype(np.float32))
    kw = dict(sample_rate_hz=2_400_000.0, max_lag=lag)

    def bench(fn, tag):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(re, im)
        jax.block_until_ready(out)
        log(f"{tag}: compile+first-run {time.time()-t0:.1f}s")
        ts = []
        for _ in range(10):
            t0 = time.time()
            out = f(re, im)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        t = float(np.median(ts))
        log(f"{tag}: {t*1e3:.2f} ms/step ({ch*b*blk/t/1e6:.0f} MS/s equiv)")
        return t, out

    t_mat, o_mat = bench(
        functools.partial(sc_ops.gcc_phat_all_pairs_split, **kw), "matmul GCC"
    )
    t_fus, o_fus = bench(
        functools.partial(sc_ops.gcc_phat_all_pairs_split_fused, **kw), "fused  GCC"
    )
    dlag = np.max(np.abs(np.asarray(o_mat.lag_samples) - np.asarray(o_fus.lag_samples)))
    log(f"max |Δlag| fused vs matmul (noise input): {dlag}")
    log(f"speedup fused vs matmul: {t_mat/t_fus:.2f}x")
    log("PROBE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
