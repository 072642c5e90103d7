"""On-chip A/B: combined FFT+detect kernel, l2rx gate, scan depth (r5).

Configs (each its own jitted callable — jit caches are shared per
callable, so every routing gets a fresh TDOAPipeline):

  A  r4 default: two-kernel (fft_rows_ct + detect kernel), gate l2, scan-16
  B  combined FFT+detect kernel, gate l2, scan-16
  C  combined FFT+detect kernel, gate l2rx (per-receiver bound), scan-16
  D  best-of-BC routing at scan-32

Interleaved epochs (A B C D × rounds) so tunnel drift cancels; one
trailing derived-scalar fetch closes each epoch (block_until_ready does
not span remote execution — docs/PROBES.md). Also prints an l2rx
τ-parity check on a correlated scene.

Run in a FRESH process under nohup (failed ops poison the client session):
  nohup python tools/probe_r5_fuse.py > docs/probe_logs/ab_r5_fuse.log 2>&1 &
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


def build(pipe_cfg, *, combined: bool, gate: str, scan: int):
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.models.pipeline import TDOAPipeline
    from radio_mapper_tpu.ops import detect as detect_ops
    from radio_mapper_tpu.ops.pallas import gcc_kernel

    detect_ops.set_fused_fft_detect("on" if combined else "off")
    gcc_kernel.set_phat_gate(gate)
    try:
        pipe = TDOAPipeline(pipe_cfg)
        re, im, anchors = pipe.example_inputs(batch=(CH,), seed=0, split=True)
        re1, im1 = jax.device_put((re, im))
        tile = jax.jit(lambda a: jnp.broadcast_to(a, (scan, *a.shape)) * 1.0)
        args = (tile(re1), tile(im1), jax.device_put(anchors))
        step = pipe.jit_step_split_scan()
        t0 = time.perf_counter()
        out = step(*args)
        from radio_mapper_tpu.utils.device import force_fetch

        force_fetch(out)
        log(f"  compile+first {time.perf_counter()-t0:.1f}s")
        return step, args
    finally:
        detect_ops.set_fused_fft_detect("auto")
        gcc_kernel.set_phat_gate("l2")


def epoch(step, args, iters=12):
    from radio_mapper_tpu.utils.device import force_fetch

    out = step(*args)
    force_fetch(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    force_fetch(outs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    from radio_mapper_tpu.models.pipeline import PipelineConfig

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    cfg = PipelineConfig(
        num_buoys=8, block_len=16_384, sample_rate_hz=2_400_000.0,
        max_lag=512, max_peaks=8, solver_iterations=25,
    )

    steps = {}
    for name, kw in (
        ("A-twokernel-l2-s16", dict(combined=False, gate="l2", scan=SCAN)),
        ("B-combined-l2-s16", dict(combined=True, gate="l2", scan=SCAN)),
        ("C-combined-l2rx-s16", dict(combined=True, gate="l2rx", scan=SCAN)),
    ):
        log(f"build {name}")
        steps[name] = (build(cfg, **kw), kw["scan"])

    results = {k: [] for k in steps}
    for rnd in range(4):
        for name, ((step, args), scan) in steps.items():
            dt = epoch(step, args) / scan
            results[name].append(dt)
            log(f"round {rnd} {name}: {dt*1e3:.2f} ms/block")
    for name, ts in results.items():
        ts = sorted(ts)
        log(f"MEDIAN {name}: {ts[len(ts)//2]*1e3:.2f} ms/block "
            f"(best {ts[0]*1e3:.2f})")

    # winner at scan-32
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    best_bc = min(("B-combined-l2-s16", "C-combined-l2rx-s16"), key=med.get)
    kw = dict(combined=True, gate="l2rx" if "l2rx" in best_bc else "l2", scan=32)
    log(f"build D-{best_bc}-s32")
    (step32, args32) = build(cfg, **kw)
    d32 = []
    for rnd in range(3):
        dt = epoch(step32, args32, iters=8) / 32
        d32.append(dt)
        log(f"round {rnd} D-s32: {dt*1e3:.2f} ms/block")
    d32.sort()
    log(f"MEDIAN D-s32: {d32[len(d32)//2]*1e3:.2f} ms/block")

    # ---- l2rx τ parity on a correlated scene (device) -----------------
    from radio_mapper_tpu import sim
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops.pallas import gcc_kernel

    import jax.numpy as jnp

    scen = sim.default_scenario(signal="noise", bandwidth_hz=150e3,
                                snr_db=20.0, seed=11)
    cap = sim.synthesize(scen)
    re = np.real(cap.iq).astype(np.float32)
    im = np.imag(cap.iq).astype(np.float32)
    spectra = sc_ops.receiver_spectra_ct(re, im, max_lag=600)
    p = np.asarray(spectra[0]) ** 2 + np.asarray(spectra[1]) ** 2
    row_smax = jnp.asarray(p.max(axis=-1))
    outs = {}
    for gate in ("l2", "l2rx"):
        gcc_kernel.set_phat_gate(gate)
        try:
            outs[gate] = sc_ops.gcc_phat_all_pairs_split_fused(
                re, im, sample_rate_hz=scen.sample_rate_hz, max_lag=600,
                spectra=spectra,
                row_smax=row_smax if gate == "l2rx" else None,
            )
        finally:
            gcc_kernel.set_phat_gate("l2")
    d = np.abs(
        np.asarray(outs["l2"].lag_samples) - np.asarray(outs["l2rx"].lag_samples)
    ).max()
    log(f"l2rx tau parity vs l2 (on-chip): {d:.2e} samples")
    log("done")


if __name__ == "__main__":
    main()
