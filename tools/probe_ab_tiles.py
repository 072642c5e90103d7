"""One-process A/B: kernel tile sizes (FFT rows_per_block × GCC pair_chunk).

Larger row blocks halve the grid-cell count and double the MXU matmuls'
free dimension (inner DFT dot [n2, n2] × [n2, rows·n1]); larger pair
chunks do the same for the inverse stage — at the cost of VMEM working
set. This probe times the fused GCC chain (forward CT-FFT + pair kernel,
the two Pallas kernels of the flagship step) at tile-size combinations,
interleaved so tunnel drift cancels. Prints one JSON line.

Usage: PYTHONPATH=/root/repo nohup python tools/probe_ab_tiles.py > /tmp/ab_tiles.log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

CONFIGS = ((8, 8), (16, 16), (16, 8))  # (rows_per_block, pair_chunk)


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.ops.gcc_phat import pair_indices
    from radio_mapper_tpu.ops.pallas import fft_kernel, gcc_kernel

    print(f"# backend: {jax.default_backend()}", flush=True)
    ch, b, n, max_lag = 32, 8, 16_384, 512
    nfft = gcc_kernel.plan_nfft(n + max_lag)
    i_idx, j_idx = pair_indices(b)
    rng = np.random.default_rng(0)
    # Distinct input sets per iteration. NOTE the 0.04 ms anomaly this
    # probe originally chased was NOT input-identity caching — fresh
    # buffers timed identically under jax.block_until_ready; the actual
    # cause is that block_until_ready does not span remote execution
    # (docs/PROBES.md). Distinct inputs are kept anyway so no
    # hypothetical result-dedup can shrink the measured work.
    inputs = [
        (
            jax.device_put(rng.normal(size=(ch, b, n)).astype(np.float32)),
            jax.device_put(rng.normal(size=(ch, b, n)).astype(np.float32)),
        )
        for _ in range(3)
    ]
    re, im = inputs[0]

    def chain(re_, im_, *, rows, chunk):
        pad = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, nfft - n)])
        fr, fi = fft_kernel.fft_rows_ct(pad(re_), pad(im_), rows_per_block=rows)
        mags = gcc_kernel.gcc_pair_lag_mags(
            fr, fi, i_idx, j_idx, max_lag=max_lag, pair_chunk=chunk
        )
        # Reduce to a scalar so the timed program cannot complete without
        # every kernel finishing (a large pure output array measured
        # implausibly fast — ~1500 TFLOP/s — through this remote backend's
        # block_until_ready; a data-dependent scalar defeats that).
        return jnp.sum(mags)

    steps = {}
    for rows, chunk in CONFIGS:
        key = f"r{rows}p{chunk}"
        t0 = time.time()
        f = jax.jit(functools.partial(chain, rows=rows, chunk=chunk))
        out = f(re, im)
        jax.block_until_ready(out)
        print(f"# {key}: compile+first {time.time()-t0:.1f}s", flush=True)
        steps[key] = f

    times = {k: [] for k in steps}
    for _ in range(6):
        for k, f in steps.items():
            t0 = time.perf_counter()
            # np.asarray: block_until_ready alone returned in ~0.04 ms for
            # ~40 GFLOP of work on this backend — only a host fetch of the
            # result reliably spans the remote execution.
            vals = [float(np.asarray(f(*inp))) for inp in inputs]
            times[k].append((time.perf_counter() - t0) / len(inputs))
            del vals

    med = {k: float(np.median(ts)) for k, ts in times.items()}
    result = {f"{k}_ms": round(v * 1e3, 3) for k, v in med.items()}
    result["per_epoch_ms"] = {
        k: [round(t * 1e3, 2) for t in ts] for k, ts in times.items()
    }
    best = min(med, key=med.get)
    result["best"] = best
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
