"""Per-stage on-chip timing: detect / correlate / solve / full step.

Run on the target TPU (slow first compiles over the tunnel are normal):

    PYTHONPATH=/root/.axon_site:. nohup python tools/chip_profile.py \
        > /tmp/chip_profile.log 2>&1 &

Prints one line per stage with per-step latency and the implied
samples/s/chip, so optimization effort goes where the time is.
"""

import sys
import time

import numpy as np


def main(num_channels=32, num_buoys=8, block_len=16_384, max_lag=512, iters=8):
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu import solver
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.ops import split_complex as sc_ops

    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=num_buoys, block_len=block_len,
            sample_rate_hz=2_400_000.0, max_lag=max_lag, solver_iterations=25,
        )
    )
    re, im, anchors = pipe.example_inputs(batch=(num_channels,), seed=0, split=True)
    # Pre-stage on device: otherwise every timed call pays the host→HBM
    # transfer (~3 ms for 33 MB over the tunnel), swamping the stage costs.
    re, im, anchors = jax.device_put((re, im, anchors))
    samples = num_channels * num_buoys * block_len

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        args = jax.device_put(args)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{name:28s} {dt*1e3:8.2f} ms/step   {samples/dt/1e6:9.1f} MS/s",
            flush=True,
        )
        return out

    c = pipe.config

    def spectra_only(re, im):
        return sc_ops.receiver_spectra_split(re, im, max_lag=c.max_lag)[0]

    def detect_only(re, im):
        power_db = sc_ops.power_spectrum_db_split(re, im)
        return detect_ops.detect_peaks(
            power_db, sample_rate_hz=c.sample_rate_hz, max_peaks=c.max_peaks
        )

    def gcc_only(re, im):
        return sc_ops.gcc_phat_all_pairs_split(
            re, im, sample_rate_hz=c.sample_rate_hz, max_lag=c.max_lag
        )

    corr = gcc_only(re, im)
    dd = np.asarray(solver.tau_to_distance_difference(corr.tau_s))

    def solve_only(dd, anchors):
        return solver.solve_tdoa(
            anchors, pipe.pair_i, pipe.pair_j, dd, iterations=c.solver_iterations
        )

    print(f"# {num_channels}ch x {num_buoys}buoys x {block_len} samples", flush=True)
    timeit("receiver_spectra (FFTs)", spectra_only, re, im)
    timeit("detect (FFT+median+topk)", detect_only, re, im)
    timeit("gcc_all_pairs (full)", gcc_only, re, im)
    timeit("solver (LM scan)", solve_only, jnp.asarray(dd), anchors)
    timeit("FULL step_split", pipe.step_split, re, im, anchors)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
