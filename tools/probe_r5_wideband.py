"""On-chip wideband (config-4) probe: r5 levers A/B + per-stage profile.

VERDICT r4 item 3: the 36.6 ms wideband block had no per-stage profile
and none of the flagship's tuning ladder applied. This probe, one
process, interleaved fetch-closed epochs:

  A  r4 routing: pair-gather HIGHEST + l2 per-pair gate
  B  r5 defaults: single-pass-bf16 pair gather + precomputed l2rx gate
  stages (cumulative subgraphs of the B routing):
     S1 PFB channelize only
     S2 + per-subchannel forward CT FFT (scan)
     S3 + one-hot pair gather (2016 pairs × 4 planes)
     S4 + row-aligned GCC kernel (whiten × iDFT × window)
     full (= + peak pick + solve)
  scan-4: four wideband blocks per dispatch (floor share at 36 ms is
     ~5%; this measures what amortization is left)
  τ parity A vs B on a correlated wideband scene (active subchannel 3).

Run in a FRESH process:
  nohup python tools/probe_r5_wideband.py > docs/probe_logs/ab_r5_wideband.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def epoch(step, args, iters=10):
    from radio_mapper_tpu.utils.device import force_fetch

    out = step(*args)
    force_fetch(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    force_fetch(outs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.models.wideband import WidebandConfig, WidebandTDOAPipeline
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops import safe
    from radio_mapper_tpu.ops.pallas import gcc_kernel
    from radio_mapper_tpu.utils.device import force_fetch

    log(f"backend: {jax.default_backend()}")
    cfg = WidebandConfig()
    rng = np.random.default_rng(0)
    re = rng.normal(size=(cfg.num_buoys, cfg.wide_block)).astype(np.float32)
    im = rng.normal(size=(cfg.num_buoys, cfg.wide_block)).astype(np.float32)
    anchors = rng.normal(scale=8_000.0, size=(cfg.num_buoys, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    args = jax.device_put((jnp.asarray(re), jnp.asarray(im), jnp.asarray(anchors)))

    def build_full(name, gather, gate):
        sc_ops.set_gcc_gather_precision(gather)
        gcc_kernel.set_phat_gate(gate)
        try:
            pipe = WidebandTDOAPipeline(cfg)
            step = pipe.jit_step_split()
            t0 = time.perf_counter()
            force_fetch(step(*args))
            log(f"  {name} compile+first {time.perf_counter()-t0:.1f}s")
            return step
        finally:
            sc_ops.set_gcc_gather_precision(None)
            gcc_kernel.set_phat_gate("l2rx")

    log("build A (gather HIGHEST, gate l2)")
    step_a = build_full("A", "highest", "l2")
    log("build B (gather bf16, gate l2rx — r5 defaults)")
    step_b = build_full("B", None, "l2rx")

    res = {"A": [], "B": []}
    for rnd in range(4):
        for name, st in (("A", step_a), ("B", step_b)):
            dt = epoch(st, args, iters=8)
            res[name].append(dt)
            log(f"round {rnd} {name}: {dt*1e3:.2f} ms/block")
    for name, ts in res.items():
        ts = sorted(ts)
        log(f"MEDIAN {name}: {ts[len(ts)//2]*1e3:.2f} ms/block")

    # ---- per-stage cumulative profile of the B routing ----------------
    pipe = WidebandTDOAPipeline(cfg)
    c = cfg

    def channelized(re, im):
        cre, cim = sc_ops.channelize_split(
            re, im, c.num_subchannels, sample_rate_hz=c.wide_rate_hz,
            taps_per_channel=c.taps_per_channel, shift=False,
        )
        return jnp.moveaxis(cre, -2, 0), jnp.moveaxis(cim, -2, 0)

    def s1(re, im, _a):
        cre, cim = channelized(re, im)
        return cre.sum() + cim.sum()

    def scan_over_sub(fn):
        def run(re, im, _a):
            cre, cim = channelized(re, im)
            def body(carry, xs):
                return carry, fn(xs[0], xs[1])
            _, outs = jax.lax.scan(body, 0, (cre, cim))
            return jax.tree.map(lambda a: a.sum(), outs)
        return run

    def s2_fn(sre, sim_):
        fr, fi, _ = sc_ops.receiver_spectra_ct(
            sre, sim_, max_lag=c.max_lag,
            precision=sc_ops.gcc_forward_precision(c.weighting),
        )
        return fr, fi

    def s3_fn(sre, sim_):
        fr, fi = s2_fn(sre, sim_)
        gp = sc_ops.gcc_gather_precision(c.weighting)
        return tuple(
            safe.pair_select(a, idx, axis=-2, precision=gp)
            for a in (fr, fi) for idx in (pipe.pair_i, pipe.pair_j)
        )

    def s4_fn(sre, sim_):
        return pipe._pair_stage(sre, sim_)

    stages = {
        "S1-pfb": s1,
        "S2-+fft": scan_over_sub(s2_fn),
        "S3-+gather": scan_over_sub(s3_fn),
        "S4-+gcckernel": scan_over_sub(s4_fn),
        "full": pipe.step_split,
    }
    compiled = {}
    for name, fn in stages.items():
        st = jax.jit(fn)
        t0 = time.perf_counter()
        force_fetch(st(*args))
        log(f"  stage {name} compile+first {time.perf_counter()-t0:.1f}s")
        compiled[name] = st
    prof = {k: [] for k in compiled}
    for rnd in range(3):
        for name, st in compiled.items():
            dt = epoch(st, args, iters=8)
            prof[name].append(dt)
    for name, ts in prof.items():
        ts = sorted(ts)
        log(f"STAGE {name}: {ts[len(ts)//2]*1e3:.2f} ms")

    # ---- scan-4 amortization -----------------------------------------
    pipe4 = WidebandTDOAPipeline(cfg)

    @jax.jit
    def scan4(reK, imK, anc):
        return jax.lax.scan(
            lambda cr, x: (cr, pipe4.step_split(x[0], x[1], anc)), 0, (reK, imK)
        )[1]

    tile = jax.jit(lambda a: jnp.broadcast_to(a, (4, *a.shape)) * 1.0)
    args4 = (tile(args[0]), tile(args[1]), args[2])
    t0 = time.perf_counter()
    force_fetch(scan4(*args4))
    log(f"  scan4 compile+first {time.perf_counter()-t0:.1f}s")
    d4 = sorted(epoch(scan4, args4, iters=5) / 4 for _ in range(3))
    log(f"SCAN4: {d4[1]*1e3:.2f} ms/block")

    # ---- τ parity A vs B on a correlated wideband scene ---------------
    from radio_mapper_tpu import sim as simmod

    emitter = np.array([3_000.0, -2_000.0, 0.0], np.float32)
    wre, wim = simmod.synthesize_wideband(
        cfg, active_subchannel=3, anchors_enu=anchors, emitter_enu=emitter,
        snr_db=20.0, seed=3,
    )
    wargs = jax.device_put((jnp.asarray(wre), jnp.asarray(wim), jnp.asarray(anchors)))
    out_a = step_a(*wargs)
    out_b = step_b(*wargs)
    la = np.asarray(out_a.lags)[3]
    lb = np.asarray(out_b.lags)[3]
    w = np.asarray(out_a.weights)[3]
    good = w > 0.3
    d = np.abs(la - lb)[good].max() if good.any() else float("nan")
    log(f"tau parity A vs B, active subchannel, {good.sum()} strong pairs: "
        f"{d:.2e} subchannel samples")
    wide_rate = cfg.num_buoys * cfg.wide_block
    best = sorted(res["B"])[len(res["B"]) // 2]
    log(f"B wide rate: {wide_rate/best/1e6:.1f} MS/s "
        f"(target 640 aggregate; {wide_rate/best/1e6/640*100:.0f}% of config-4)")
    log("done")


if __name__ == "__main__":
    main()
