"""Benchmark: full-pipeline IQ throughput per chip, with MFU accounting.

Runs the flagship TDOA pipeline (batched PSD detect → all-pairs GCC-PHAT →
LM solve) on the default JAX backend and prints ONE JSON line:

    {"metric": "iq_samples_per_s_per_chip", "value": ..., "unit": ...,
     "vs_baseline": ..., "mfu": ..., "fft_ms_per_s": ..., "pairs_per_s": ...,
     "step_ms": ..., "path": ...}

Baseline: the north-star real-time target of 256 simultaneous 2.4 MS/s
channels on a 16-chip v5p slice (BASELINE.json) ⇒ 16 ch × 2.4 MS/s =
38.4 M IQ samples/s per chip. ``vs_baseline`` > 1 means the chip keeps up
with its share of the pod-scale target, with the full detection +
correlation + solve stack running, not just the FFTs.

Methodology (replaces round 1's best-of-two, per VERDICT r1 §weak-1):
- every timing is an epoch of ``iters`` CHAINED dispatches closed by ONE
  derived-scalar host fetch, elapsed/iters (block_until_ready does not
  span remote execution on this backend and per-call sync pays a ~20 ms
  tunnel RTT — docs/PROBES.md); three epochs per config, the MEDIAN is
  the headline (best epoch kept as a secondary field) and the spread is
  printed to stderr as a variance check;
- ``mfu`` = achieved FLOP/s ÷ the chip's peak (XLA's own per-program
  cost_analysis supplies the FLOP count; analytic DFT-matmul count is the
  fallback). This is the framework's analog of the reference's only perf
  harness, rtl_test's PPM/drop benchmark (`Code/src/rtl_test.c:137-213`);
- kernel microbenches: forward-FFT samples/s and GCC pairs/s isolate the
  two hot kernels from the end-to-end number.

(For context, the reference's per-node Python detector processes 16384
samples every ~2 s ≈ 8 kS/s — `buoy_node.py:364,220`.)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Per-chip share of the north-star target (see module docstring).
BASELINE_SAMPLES_PER_S_PER_CHIP = 38_400_000.0

# Peak dense-matmul FLOP/s per chip for MFU accounting. The target is a
# v5e (bf16 MXU peak ≈ 197 TFLOP/s; f32 work runs as multi-pass bf16, so
# bf16 peak is the honest roofline denominator).
PEAK_FLOPS_BY_PLATFORM = {
    "tpu": 197e12,
    "axon": 197e12,
}


def _log(msg: str):
    print(f"# {msg}", file=sys.stderr)


def _build(num_channels, num_buoys, block_len, sample_rate_hz, max_lag):
    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline

    return TDOAPipeline(
        PipelineConfig(
            num_buoys=num_buoys,
            block_len=block_len,
            sample_rate_hz=sample_rate_hz,
            max_lag=max_lag,
            max_peaks=8,
            solver_iterations=25,
        )
    )


def _force(outs) -> float:
    """Force completion of every output in ``outs`` via ONE host fetch.

    `jax.block_until_ready` is NOT trustworthy on the remote TPU backend:
    it returned in ~0.04 ms for a ~40 GFLOP program whose true latency
    (measured by value fetch) was ~29 ms (docs/PROBES.md). The fetched
    scalar is derived from every leaf of EVERY output (tiny on-device
    reductions + adds), so no dispatched execution can be elided as dead
    code — the single materialized value depends on all of them.
    """
    from radio_mapper_tpu.utils.device import force_fetch

    return force_fetch(outs)


def _epoch_time(step, args, *, iters: int, warmup: int = 2) -> float:
    """Per-step wall time: ``iters`` dispatches + ONE trailing host fetch
    of a scalar depending on all outputs, elapsed/iters.

    Per-call synchronization through the tunnel costs a ~20 ms RTT that
    would swamp a ~8 ms step; the single all-consuming fetch amortizes
    one RTT across the whole epoch (bias ≈ RTT/iters). Executions
    serialize on the device, so elapsed/iters is the honest steady-state
    throughput.
    """
    for _ in range(max(warmup, 1)):
        out = step(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    _force(outs)
    return (time.perf_counter() - t0) / iters


def _median_epoch_time(step, args, *, iters: int, epochs: int = 3) -> float:
    """Median of several fetch-closed epochs (compile amortized once).

    Single-epoch microbench numbers swung up to 5× with tunnel state
    between the r4 validation runs; the median stabilizes them at the
    cost of zero extra compiles."""
    ts = [_epoch_time(step, args, iters=iters, warmup=2 if k == 0 else 1)
          for k in range(epochs)]
    return sorted(ts)[len(ts) // 2]


def _program_flops(step, args) -> float:
    """FLOPs per step from XLA's cost analysis (0.0 if unavailable).

    Skipped on TPU unless BENCH_COST_ANALYSIS=1: the AOT lower+compile
    here is a SECOND full remote compile (minutes each on the compile
    lottery, docs/PROBES.md) and its figure under-reports ~35× on the
    remote path, so the analytic floor always wins anyway.
    """
    import os

    import jax

    if jax.default_backend() == "tpu" and not os.environ.get("BENCH_COST_ANALYSIS"):
        return 0.0
    try:
        compiled = jax.jit(step).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception as e:
        _log(f"cost_analysis unavailable ({e}); using analytic FLOPs")
        return 0.0


def _analytic_step_flops(num_channels, num_buoys, block_len, max_lag) -> float:
    """Analytic FLOP count of the split pipeline's dominant matmul work.

    One four-step DFT of length N = N1·N2 decomposed to real f32 matmuls
    costs 8·N·(N1+N2) mul-adds = 16·N·(N1+N2) FLOPs per transform.
    Per channel: B forward FFTs (nfft) + P inverse FFTs (nfft) + the
    detector reusing the correlation bins (free).
    """
    from radio_mapper_tpu.ops import fft as fft_ops

    nfft = fft_ops.friendly_fft_len(block_len + max_lag)
    # mirror ops.fft._split_length recursion cost to first order
    n1 = max(d for d in range(1, int(np.sqrt(nfft)) + 1) if nfft % d == 0 and d <= 1024)
    n2 = nfft // n1
    per_fft = 16.0 * nfft * (n1 + n2)
    pairs = num_buoys * (num_buoys - 1) // 2
    return num_channels * (num_buoys + pairs) * per_fft


def build_pipeline_step(
    *,
    num_channels: int = 32,
    num_buoys: int = 8,
    block_len: int = 16_384,
    sample_rate_hz: float = 2_400_000.0,
    max_lag: int = 512,
    path: str = "auto",  # auto | split | complex
    scan_blocks: int = 1,
):
    """Compile ONE step (remote AOT compiles cost minutes — reuse it for
    every epoch). Returns (name, compiled_step, args, flops_per_step).

    ``scan_blocks=K > 1`` compiles the K-block `lax.scan` program
    (pipeline.step_split_scan): one dispatch covers K blocks, amortizing
    the ~1.5-2.3 ms per-dispatch floor AND the tunnel's per-dispatch
    jitter — measured on-chip r4: 8.1 ms/block at 128 ch with K=4, epoch
    spread 1.5% where the single-block program swung 2× (probe_ab_step_r4).
    FLOPs returned are PER BLOCK.
    """
    import jax

    pipe = _build(num_channels, num_buoys, block_len, sample_rate_hz, max_lag)
    # Build on host and split BEFORE any device transfer: some TPU runtimes
    # cannot device_put complex64 at all.
    re, im, anchors = pipe.example_inputs(batch=(num_channels,), seed=0, split=True)
    if scan_blocks > 1:
        if path == "complex":
            raise ValueError("scan_blocks supports the split path only")
        # Ship ONE block over the (40 MB/s tunnel) link and materialize
        # the K-block stack ON-DEVICE: at 256 ch × K=16 the stack is
        # ~4.3 GB — hours of tunnel vs seconds for a single block. The
        # duplicated blocks don't change the (data-independent) timing.
        import jax.numpy as jnp

        re1, im1 = jax.device_put((re, im))
        tile = jax.jit(
            lambda a: jnp.broadcast_to(a, (scan_blocks, *a.shape)) * 1.0
        )
        name = f"split-scan{scan_blocks}"
        return (
            name,
            pipe.jit_step_split_scan(),
            (tile(re1), tile(im1), jax.device_put(anchors)),
            _analytic_step_flops(num_channels, num_buoys, block_len, max_lag),
        )

    attempts = []
    if path in ("auto", "split"):
        attempts.append(("split", pipe.step_split, pipe.jit_step_split(), (re, im, anchors)))
    if path in ("auto", "complex"):
        iq = jax.lax.complex(re, im)
        attempts.append(("complex", pipe.step, pipe.jit_step(), (iq, anchors)))

    last_err = None
    for name, raw_fn, step, args in attempts:
        try:
            args = jax.device_put(args)
            t0 = time.perf_counter()
            out = step(*args)
            _force(out)  # block_until_ready may return before execution
            _log(f"path {name!r}: compile+first {time.perf_counter()-t0:.1f}s")
            flops = _program_flops(raw_fn, args)
            # XLA's cost_analysis under-reports on some AOT backends
            # (observed 35×); the analytic dominant-terms count is a floor.
            flops = max(
                flops,
                _analytic_step_flops(num_channels, num_buoys, block_len, max_lag),
            )
            return name, step, args, flops
        except Exception as e:  # try the next path
            last_err = e
            _log(f"bench path {name!r} failed: {e}")
    raise RuntimeError(f"all bench paths failed: {last_err}")


def run_pipeline_bench(
    *,
    num_channels: int = 32,
    iters: int = 10,
    **kwargs,
):
    """Single-shot convenience: build + one timed epoch."""
    num_buoys = kwargs.get("num_buoys", 8)
    block_len = kwargs.get("block_len", 16_384)
    name, step, args, flops = build_pipeline_step(
        num_channels=num_channels, **kwargs
    )
    step_s = _epoch_time(step, args, iters=iters, warmup=0)
    rate = num_channels * num_buoys * block_len / step_s
    return rate, name, step_s, flops


def run_fft_microbench(*, rows: int = 256, n: int = 16_384, iters: int = 50) -> float:
    """Forward split-complex FFT throughput (complex samples/s)."""
    import jax

    from radio_mapper_tpu.ops import fft as fft_ops

    rng = np.random.default_rng(0)
    re = jax.device_put(rng.normal(size=(rows, n)).astype(np.float32))
    im = jax.device_put(rng.normal(size=(rows, n)).astype(np.float32))
    step = jax.jit(fft_ops.fft_re_im)
    dt = _median_epoch_time(step, (re, im), iters=iters)
    return rows * n / dt


def run_gcc_microbench(
    *, channels: int = 32, num_buoys: int = 8, n: int = 16_384, max_lag: int = 512,
    iters: int = 50, scan_blocks: int = 64,
) -> float:
    """All-pairs GCC-PHAT throughput (pair correlations/s).

    Scan-amortized (``scan_blocks`` blocks per dispatch) with the SAME
    methodology as :func:`run_ep_microbench`, so the two pairs/s numbers
    in the JSON are directly comparable (VERDICT r4 weak #5: the r4
    headline mixed an unamortized single-dispatch gcc number with a
    scan-amortized EP number). Depth 32 adopted late r5: both
    microbenches' ~1-1.6 ms blocks still carried 11-27% dispatch floor
    at scan-8 — scan-32 won both interleaved rounds, gcc 781/799 → 938/
    945 k, EP 1143/1149 → 1415/1409 k pairs/s (probe_r5_pairs_scan);
    64 then won all four 32-vs-64 pairings too (gcc 972/973 vs 939/943,
    EP 1452/1490 vs 1413/1439 k; ab_r5_pairs_scan64) — adopted; 128 not
    chased (gcc stack would hit 4.3 GB for a ≤2% residual floor)."""
    import functools

    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.ops import split_complex as sc_ops

    rng = np.random.default_rng(0)
    re = jax.device_put(rng.normal(size=(channels, num_buoys, n)).astype(np.float32))
    im = jax.device_put(rng.normal(size=(channels, num_buoys, n)).astype(np.float32))
    # Measure whatever the pipeline would actually route to (fused Pallas
    # pair stage on TPU when supported, XLA matmul path otherwise).
    fn = (
        sc_ops.gcc_phat_all_pairs_split_fused
        if sc_ops.gcc_fused_enabled(n + max_lag, "phat")
        else sc_ops.gcc_phat_all_pairs_split
    )
    base = functools.partial(fn, sample_rate_hz=2_400_000.0, max_lag=max_lag)
    pairs = num_buoys * (num_buoys - 1) // 2
    if scan_blocks > 1:
        k = scan_blocks
        tile = jax.jit(lambda a: jnp.broadcast_to(a, (k, *a.shape)) * 1.0)
        reK, imK = tile(re), tile(im)

        @jax.jit
        def scan_step(rK, iK):
            return jax.lax.scan(lambda c, x: (c, base(x[0], x[1])), 0, (rK, iK))[1]

        dt = _median_epoch_time(scan_step, (reK, imK), iters=iters) / k
    else:
        dt = _median_epoch_time(jax.jit(base), (re, im), iters=iters)
    return channels * pairs / dt


def run_ep_microbench(
    *, num_buoys: int = 64, block_len: int = 4096, max_lag: int = 256,
    iters: int = 20, scan_blocks: int = 64,
) -> float:
    """Pair-EP step throughput: 64 receivers → 2016 pairs on a 1-device
    "pair" mesh (the EP program bench VERDICT r2 item 8 asked for; the
    8-device CPU mesh in tests/test_pair_ep.py is the shape-truth side).
    Routes through the fused GCC kernel when the platform supports it.
    ``scan_blocks`` folds K consecutive blocks into one dispatch (the
    r4 lever: a single EP step is ~4 ms of which ~2 ms was dispatch
    floor — the scan reports the amortized steady-state rate)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from radio_mapper_tpu.parallel.pair_ep import PairEPConfig, build_pair_ep_step

    cfg = PairEPConfig(
        num_buoys=num_buoys, block_len=block_len, max_lag=max_lag,
        solver_iterations=10,
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("pair",))
    step, shardings, (pi, _pj) = build_pair_ep_step(mesh, cfg)
    rng = np.random.default_rng(0)
    re = jax.device_put(
        rng.normal(size=(num_buoys, block_len)).astype(np.float32), shardings[0]
    )
    im = jax.device_put(
        rng.normal(size=(num_buoys, block_len)).astype(np.float32), shardings[1]
    )
    anchors = rng.normal(scale=5_000.0, size=(num_buoys, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    anchors = jax.device_put(anchors, shardings[2])
    if scan_blocks > 1:
        k = scan_blocks
        tile = jax.jit(lambda a: jnp.broadcast_to(a, (k, *a.shape)) * 1.0)
        reK, imK = tile(re), tile(im)

        @jax.jit
        def scan_step(rK, iK, anc):
            return jax.lax.scan(
                lambda c, x: (c, step(x[0], x[1], anc)), 0, (rK, iK)
            )[1]

        dt = _median_epoch_time(scan_step, (reK, imK, anchors), iters=iters) / k
    else:
        dt = _median_epoch_time(step, (re, im, anchors), iters=iters)
    return len(pi) / dt


def run_wideband_bench(*, iters: int = 10, scan_blocks: int = 64):
    """BASELINE config 4 for real: 64 buoys × 10 MS/s wideband → 16-way
    polyphase channelizer → per-subchannel all-pairs GCC-PHAT (2016
    pairs) → LM solve, one chip, one jitted program (VERDICT r3 item 3).
    ``scan_blocks`` folds K blocks per dispatch (same amortization as the
    flagship; A/B'd r5: 11.4 → 9.1 ms/block at scan-4, ab_r5_wideband2;
    the late-r5 depth ladder won every interleaved pairing — scan-8 7.78-
    8.17 vs scan-4 8.29-8.65, scan-16 7.58-7.59 vs scan-8 7.88-8.00,
    scan-32 7.42-7.44 vs scan-16 7.58-7.64, scan-64 7.38/7.39 vs
    scan-32 7.45/7.49 ms/block (probe_r5_wb_scan8 + ab_r5_wb_scan{16,32}
    + ab_r5_wb_scan64) — the 33 MB/block input stack makes depth cheap;
    the ladder closes at 64 (569 wide MS/s; gains now ~1%/step).
    Returns (ms_per_block, wide_samples_per_s, pairs_per_s)."""
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.models.wideband import WidebandConfig, WidebandTDOAPipeline

    cfg = WidebandConfig()
    pipe = WidebandTDOAPipeline(cfg)
    re, im, anchors = jax.device_put(pipe.example_inputs(seed=0))
    if scan_blocks > 1:
        k = scan_blocks
        tile = jax.jit(lambda a: jnp.broadcast_to(a, (k, *a.shape)) * 1.0)
        args = (tile(re), tile(im), anchors)

        @jax.jit
        def step(rK, iK, anc):
            return jax.lax.scan(
                lambda c, x: (c, pipe.step_split(x[0], x[1], anc)), 0, (rK, iK)
            )[1]
    else:
        k = 1
        args = (re, im, anchors)
        step = pipe.jit_step_split()
    t0 = time.perf_counter()
    _force(step(*args))
    _log(f"wideband config-4 compile+first {time.perf_counter()-t0:.1f}s")
    dt = _epoch_time(step, args, iters=iters, warmup=1) / k
    wide_rate = cfg.num_buoys * cfg.wide_block / dt
    pair_rate = cfg.num_subchannels * cfg.num_pairs / dt
    return dt * 1e3, wide_rate, pair_rate


def run_ingest_bench(
    *, channels: int = 32, num_buoys: int = 8, block_len: int = 16_384,
    sample_rate_hz: float = 2_400_000.0, max_lag: int = 512, steps: int = 30,
    blocks_per_dispatch: int = 1, overdrive: float = 1.0,
):
    """Ingest-closed sustained throughput: native ring → double-buffered
    host→HBM uint8 upload → jitted step, paced at REAL TIME for the
    benched channel count (channels × buoys × sample_rate). Returns the
    IngestLoopStats; drops == 0 means the pipeline kept up with the
    virtual SDR clock (`rtl_test.c:109-135` criterion)."""
    import jax

    from radio_mapper_tpu.ingest.native import NativeIngest
    from radio_mapper_tpu.ingest.runner import IngestLoop

    pipe = _build(channels, num_buoys, block_len, sample_rate_hz, max_lag)
    rng = np.random.default_rng(0)
    anchors = rng.normal(scale=8_000.0, size=(num_buoys, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    anchors = jax.device_put(
        np.ascontiguousarray(np.broadcast_to(anchors, (channels, num_buoys, 3)))
    )
    rate_samples = channels * num_buoys * sample_rate_hz
    # Multi-block dispatches use the lax.scan program (r4): the
    # [K, ch, B, 2N] block stack IS the scan input, one dispatch covers K
    # blocks of budget with the block body compiled once.
    step = (
        pipe.jit_step_split_uint8_scan()
        if blocks_per_dispatch > 1
        else pipe.jit_step_split_uint8()
    )
    loop = IngestLoop(
        step, None,
        channels=channels, num_buoys=num_buoys, block_len=block_len,
        anchors=anchors, source_samples_per_s=rate_samples,
        blocks_per_dispatch=blocks_per_dispatch,
    )
    t0 = time.perf_counter()
    loop.warm_compile()
    _log(f"ingest u8-step compile+first {time.perf_counter()-t0:.1f}s")
    # ring sized for ~8 dispatches of headroom
    # ``overdrive`` paces the virtual SDR clock FASTER than nominal: a
    # nominal-paced source caps the measurable ratio at 1.0 (the consumer
    # cannot outrun production), so drops==0 at overdrive×nominal is how
    # ">1× real time with headroom" is actually demonstrated. The
    # reported real_time_ratio stays relative to the NOMINAL rate.
    block_bytes = blocks_per_dispatch * channels * num_buoys * 2 * block_len
    ring = 1 << max(24, (block_bytes * 8).bit_length())
    ing = NativeIngest.open_synthetic_paced(
        seed=1, bytes_per_s=overdrive * 2.0 * rate_samples, ring_bytes=ring
    )
    loop.ingest = ing
    try:
        return loop.run(num_steps=steps, warmup_steps=0)
    finally:
        ing.close()


def run_ingest_loopback_bench(
    *, channels: int = 32, num_buoys: int = 8, block_len: int = 16_384,
    sample_rate_hz: float = 2_400_000.0, steps: int = 60,
    drain_threads: int = 4,
):
    """Tunnel-free host-ingest loopback (VERDICT r3 item 2).

    Proves the REPO-OWNED ingest leg — paced ring → parallel C++ drain
    into a pre-allocated slot → device_put — sustains the 32-channel
    flagship byte stream (1.23 GB/s of uint8) with zero drops, on the
    local CPU device so no tunnel/link noise enters. The device step is a
    trivial decode+reduce: the full pipeline's compute belongs to the
    chip benches above; this isolates the host leg the r3 bench measured
    at 44.7 ms/step (a number that turned out to be tunnel-crypto CPU
    contention, not drain cost — the drain alone measures ~2.5 ms/block).
    """
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.ingest.native import NativeIngest
    from radio_mapper_tpu.ingest.runner import IngestLoop

    cpu = jax.devices("cpu")[0]
    put = lambda x: jax.device_put(x, cpu)

    def consume(raw, _anchors):
        # a sparse probe-read of the device buffer: device_put already
        # copied every byte (the handoff under test); a full CPU reduce
        # would just burn the same cores the drain needs
        return jnp.sum(raw[..., ::4097].astype(jnp.float32))

    step = jax.jit(consume)
    anchors = put(np.zeros((1,), np.float32))
    rate_samples = channels * num_buoys * sample_rate_hz
    loop = IngestLoop(
        step, None,
        channels=channels, num_buoys=num_buoys, block_len=block_len,
        anchors=anchors, source_samples_per_s=rate_samples,
        device_put=put, drain_threads=drain_threads,
    )
    loop.warm_compile()
    block_bytes = channels * num_buoys * 2 * block_len
    # 32 blocks (~220 ms at the 32-ch rate) of ring: an 8-block ring
    # dropped on transient scheduler stalls (~80 MB once in 3 runs);
    # real-time-ness is judged by sustained drain, buffered slack is free
    ring = 1 << max(24, (block_bytes * 32).bit_length())
    ing = NativeIngest.open_synthetic_paced(
        seed=2, bytes_per_s=2.0 * rate_samples, ring_bytes=ring,
        chunk_bytes=1 << 18,
    )
    loop.ingest = ing
    try:
        return loop.run(num_steps=steps, warmup_steps=0)
    finally:
        ing.close()


def main():
    import os

    import jax

    backend = jax.default_backend()
    peak = PEAK_FLOPS_BY_PLATFORM.get(backend)

    # Tunnel-free host-leg proof FIRST, before any TPU work touches the
    # process: the r4 validation run showed the loopback reading 10×
    # slower when run after the chip sections (1.41 GB/s standalone vs
    # 0.14 in-process — CPU-client state left by the heavy TPU sections),
    # and its numbers must reflect the drain, not process history.
    loopback = None
    try:
        loopback = run_ingest_loopback_bench()
        _log(
            f"ingest loopback 32ch (no tunnel): "
            f"{loopback.sustained_samples_per_s*2/1e9:.2f} GB/s "
            f"({loopback.real_time_ratio:.2f}x real time), "
            f"dropped_bytes={loopback.dropped_bytes}, "
            f"host {loopback.host_read_ms_per_step:.2f} ms/step"
        )
    except Exception as e:
        _log(f"ingest loopback bench failed: {e}")

    # A/B hook: BENCH_GCC_FUSED=on|off|auto forces the GCC pair-stage
    # routing (fused Pallas kernel vs XLA matmul path) for clean
    # comparisons on the same tunnel state.
    mode = os.environ.get("BENCH_GCC_FUSED")
    if mode:
        from radio_mapper_tpu.ops import split_complex as sc_ops

        sc_ops.set_gcc_fused(mode)
        _log(f"GCC fused routing forced: {mode}")

    # Channel-count sweep over 4-block lax.scan programs (r4): one
    # dispatch covers 4 blocks, amortizing the ~1.5-2.3 ms dispatch floor
    # AND the tunnel's per-dispatch jitter — measured epoch spread fell
    # from 26-57% (r3 single-block) to ~1.5% (probe_ab_step_r4). Each
    # config compiles once; headline = TRIMMED median over 5 epochs with
    # a tunnel-state guard (epochs slower than 2× the fastest are
    # discarded as tunnel stalls, VERDICT r3 item 5). Channel ladder
    # starts at 64: the floor is already amortized by the scan, and every
    # config costs a multi-minute remote compile.
    # Scan depth ladder A/B'd on-chip: single-block ~13 → K=4 8.56 →
    # K=8 6.98 → K=16 6.51 ms/block at 128 ch (probe_ab_tuning_r4,
    # probe_ab_depth_rows). K=16 input stacks stay ≲4.3 GB at 256 ch.
    # scan-32 A/B'd r5: 5.24 (s16) → 5.04 ms/block (docs/probe_logs/
    # ab_r5_fuse.log); scan-64 A/B'd late r5 at 128 ch: 4.81-4.87 →
    # 4.72 ms/block both interleaved rounds (ab_r5_flag64.log) — the
    # 8.6 GB depth-64 stack fits at ≤128 ch (the 256-ch scan-16 program
    # proves that stack size + workspace), 256 ch keeps its cap.
    scan_k = int(os.environ.get("BENCH_SCAN_BLOCKS", "64"))
    best = {"rate": 0.0}
    for ch in (64, 128, 256):
        # 256 ch × scan-32 input stacks are ~8.6 GB of f32 planes —
        # uncomfortably near the 16 GB HBM with workspace; cap at 16
        # (and 128 ch × scan-128 would be the same: cap depth so the
        # input stack stays ≤8.6 GB).
        ch_scan = min(scan_k, 16) if ch >= 256 else min(scan_k, 64)
        try:
            path, step, args, flops = build_pipeline_step(
                num_channels=ch, scan_blocks=ch_scan
            )
        except Exception as e:
            _log(f"bench channels={ch} failed entirely: {e}")
            continue
        samples = ch_scan * ch * 8 * 16_384
        epochs = []
        for epoch in range(5):
            # warmup=3 on the first epoch: compile + service warm-up
            # effects persist past the first execution (docs/PROBES.md).
            step_s = _epoch_time(
                step, args, iters=15, warmup=3 if epoch == 0 else 1
            )
            epochs.append((samples / step_s, step_s / ch_scan))
        epochs.sort()
        spread = (epochs[-1][0] - epochs[0][0]) / epochs[len(epochs) // 2][0]
        # tunnel-state guard: drop epochs >2× slower than the best
        kept = [e for e in epochs if e[1] <= 2.0 * epochs[-1][1]]
        rate, blk_s = kept[len(kept) // 2]
        rate_best = epochs[-1][0]
        _log(
            f"channels={ch} x{ch_scan}blk: epoch spread {spread*100:.1f}%, "
            f"kept {len(kept)}/{len(epochs)}"
        )
        _log(
            f"channels={ch}: trimmed median {rate/1e6:.1f} MS/s/chip "
            f"(best {rate_best/1e6:.1f}, path={path}, {blk_s*1e3:.2f} ms/block)"
        )
        if rate > best["rate"]:
            best = {
                "rate": rate, "rate_best": rate_best, "path": path,
                "step_s": blk_s, "flops": flops, "channels": ch,
            }

    fft_rate = 0.0
    gcc_rate = 0.0
    try:
        fft_rate = run_fft_microbench()
        _log(f"fft microbench: {fft_rate/1e6:.1f} M complex samples/s")
    except Exception as e:
        _log(f"fft microbench failed: {e}")
    try:
        gcc_rate = run_gcc_microbench()
        _log(f"gcc microbench: {gcc_rate:.0f} pair correlations/s (scan-64 amortized)")
    except Exception as e:
        _log(f"gcc microbench failed: {e}")

    ep_rate = 0.0
    try:
        ep_rate = run_ep_microbench()
        _log(
            f"ep microbench: {ep_rate:.0f} EP pairs/s "
            "(64 buoys / 2016 pairs, scan-64 amortized)"
        )
    except Exception as e:
        _log(f"ep microbench failed: {e}")

    wb = None
    try:
        wb = run_wideband_bench()
        _log(
            f"wideband config-4: {wb[0]:.1f} ms/block = {wb[1]/1e6:.1f} wide MS/s "
            f"(64 buoys x 10 MS/s), {wb[2]/1e3:.0f}k pairs/s"
        )
    except Exception as e:
        _log(f"wideband config-4 bench failed: {e}")

    # Ingest-closed sustained run (VERDICT r2 item 1): real-time pace for
    # the benched channel count; halve channels until the loop keeps up.
    # Start at ≤32 ch: the host→device leg here rides an SSH tunnel, and
    # 64+ ch real time needs >2.4 GB/s of transfer — physical deployments
    # have PCIe; the sweep finds what THIS link sustains.
    # Ladder 32 → 8 → 1 (each rung is a fresh remote compile; finer
    # halving adds minutes of compile for little information — the
    # measured regimes are "compute-rich link" vs "tunnel-bound").
    ingest = None
    ingest_channels = None
    ladder = [c for c in (32, 8, 1) if c <= min(best.get("channels") or 32, 32)]
    for try_channels in ladder:
        try:
            st = run_ingest_bench(channels=try_channels)
            _log(
                f"ingest {try_channels}ch: {st.sustained_samples_per_s/1e6:.1f} MS/s "
                f"sustained ({st.real_time_ratio:.2f}x real time), "
                f"dropped_bytes={st.dropped_bytes}, "
                f"host {st.host_read_ms_per_step:.2f} ms + put {st.transfer_ms_per_step:.2f} ms /step"
            )
            ingest = st
            ingest_channels = try_channels
            if st.dropped_bytes == 0 and st.real_time_ratio >= 0.95:
                break
        except Exception as e:
            _log(f"ingest bench {try_channels}ch failed: {e}")
    ingest_bpd = 1
    if ingest is None or ingest.real_time_ratio < 0.95:
        # Dispatch-floor amortization: one more attempt at 1 ch with 8
        # blocks per lax.scan dispatch (the link's fixed per-dispatch
        # costs eat a single 6.8 ms block budget; the scan spreads them
        # 8x), paced at 1.3x nominal — drops==0 there demonstrates the
        # >=1.2x-real-time headroom VERDICT r3 item 4 asks for.
        try:
            st = run_ingest_bench(channels=1, blocks_per_dispatch=8,
                                  overdrive=1.3)
            _log(
                f"ingest 1ch x8blk-scan @1.3x pace: "
                f"{st.sustained_samples_per_s/1e6:.1f} MS/s "
                f"({st.real_time_ratio:.2f}x nominal), "
                f"dropped_bytes={st.dropped_bytes}"
            )
            if ingest is None or st.real_time_ratio > ingest.real_time_ratio:
                ingest, ingest_channels, ingest_bpd = st, 1, 8
        except Exception as e:
            _log(f"ingest 1ch x8blk failed: {e}")

    mfu = None
    if best["rate"] > 0 and peak and best.get("flops"):
        achieved = best["flops"] / best["step_s"]
        mfu = achieved / peak
        _log(
            f"MFU: {best['flops']/1e9:.2f} GFLOP/step ÷ {best['step_s']*1e3:.2f} ms "
            f"= {achieved/1e12:.2f} TFLOP/s = {mfu*100:.1f}% of {peak/1e12:.0f} TF peak"
        )

    value = best["rate"]
    print(
        json.dumps(
            {
                "metric": "iq_samples_per_s_per_chip",
                "value": round(float(value), 1),  # median-of-epochs
                "value_best_epoch": round(float(best.get("rate_best", 0.0)), 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(value / BASELINE_SAMPLES_PER_S_PER_CHIP, 4),
                "mfu": round(mfu, 4) if mfu is not None else None,
                "fft_ms_per_s": round(fft_rate / 1e6, 1),
                # Both pair metrics are scan-8-amortized steady-state rates
                # (same methodology since r5; r4's pairs_per_s was the
                # unamortized single-dispatch figure — not comparable).
                "pairs_per_s": round(gcc_rate, 1),
                "ep_pairs_per_s": round(ep_rate, 1),
                "ingest_channels": ingest_channels if ingest else None,
                "ingest_blocks_per_dispatch": ingest_bpd if ingest else None,
                "ingest_sustained_ms_per_s": (
                    round(ingest.sustained_samples_per_s / 1e6, 1) if ingest else None
                ),
                "ingest_real_time_ratio": (
                    round(ingest.real_time_ratio, 3) if ingest else None
                ),
                # BYTES of ring overflow (2 bytes = one I/Q sample) —
                # renamed from the ambiguous pre-r5 "ingest_drops"
                "ingest_dropped_bytes": ingest.dropped_bytes if ingest else None,
                "ingest_host_ms_per_step": (
                    round(ingest.host_read_ms_per_step, 3) if ingest else None
                ),
                "ingest_transfer_ms_per_step": (
                    round(ingest.transfer_ms_per_step, 3) if ingest else None
                ),
                "ingest_loopback_gb_per_s": (
                    round(loopback.sustained_samples_per_s * 2 / 1e9, 3)
                    if loopback else None
                ),
                "ingest_loopback_dropped_bytes": (
                    loopback.dropped_bytes if loopback else None
                ),
                "ingest_loopback_host_ms": (
                    round(loopback.host_read_ms_per_step, 3) if loopback else None
                ),
                "wideband_ms_per_block": round(wb[0], 2) if wb else None,
                "wideband_pairs_per_s": round(wb[2], 1) if wb else None,
                "step_ms": round(best.get("step_s", 0.0) * 1e3, 3),
                "path": best.get("path"),
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
