"""Does the JAX persistent compilation cache work through the remote
TPU backend? If yes, bench/driver runs stop paying the multi-minute
remote AOT compile for programs already compiled once.

Usage: run TWICE in fresh processes; the second run's compile time tells.
    python tools/probe_compile_cache.py
"""

import sys
import time

CACHE_DIR = "/tmp/jax_persistent_cache"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline

    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=8, block_len=16_384, sample_rate_hz=2_400_000.0,
            max_lag=512, solver_iterations=25,
        )
    )
    re, im, anchors = pipe.example_inputs(batch=(8,), seed=0, split=True)
    args = jax.device_put((re, im, anchors))
    t0 = time.time()
    out = pipe.jit_step_split()(*args)
    jax.block_until_ready(out)
    print(f"compile+first: {time.time()-t0:.1f}s (backend {jax.default_backend()})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
