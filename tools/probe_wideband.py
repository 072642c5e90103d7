"""On-chip probe: BASELINE config-4 wideband pipeline (VERDICT r3 item 3).

64 buoys × 10 MS/s → 16-way PFB → per-subchannel all-pairs GCC (2016
pairs) → solve, one jitted program. Phase 1 checks physics (a synthetic
emitter in one subchannel localizes); phase 2 times fetch-closed epochs.

Run fresh:  nohup python tools/probe_wideband.py > docs/probe_logs/wideband_r4.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu import constants
    from radio_mapper_tpu.models.wideband import WidebandConfig, WidebandTDOAPipeline
    from radio_mapper_tpu.utils.device import force_fetch

    C = constants.SPEED_OF_LIGHT_M_S
    log(f"backend={jax.default_backend()}")
    cfg = WidebandConfig()  # 64 buoys, 10 MS/s, 16 subchannels, 2016 pairs
    pipe = WidebandTDOAPipeline(cfg)
    log(f"wide_block={cfg.wide_block} sub_rate={cfg.sub_rate_hz} "
        f"pairs={cfg.num_pairs} fused={pipe._use_fused}")

    # ---- phase 1: physics — emitter in subchannel 5
    rng = np.random.default_rng(0)
    b, n, fs = cfg.num_buoys, cfg.wide_block, cfg.wide_rate_hz
    ang = 2 * np.pi * np.arange(b) / b
    anchors = np.stack(
        [20_000 * np.cos(ang), 20_000 * np.sin(ang), np.zeros(b)], -1
    ).astype(np.float32)
    emitter = np.array([3_000.0, -4_000.0, 0.0])
    sub = 5
    f0 = np.fft.fftfreq(cfg.num_subchannels, d=1.0 / fs)[sub]
    base = rng.normal(size=2 * n).view(np.complex128)[:n]
    spec = np.fft.fft(base)
    f = np.fft.fftfreq(n, 1.0 / fs)
    spec[np.abs(f) > 0.25 * cfg.sub_rate_hz] = 0.0
    s = np.fft.ifft(spec)
    s *= np.exp(2j * np.pi * f0 * np.arange(n) / fs)
    s /= np.std(s)
    iq = np.empty((b, n), np.complex128)
    sfft = np.fft.fft(s)
    for k in range(b):
        d = np.linalg.norm(emitter - anchors[k])
        # exact fractional delay τ = d/C: phase ramp exp(−2jπ f τ)
        iq[k] = np.fft.ifft(sfft * np.exp(-2j * np.pi * f * d / C))
    iq = 10.0 * iq + (rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))) / np.sqrt(2)
    re = jax.device_put(iq.real.astype(np.float32))
    im = jax.device_put(iq.imag.astype(np.float32))
    anc = jax.device_put(anchors)

    step = pipe.jit_step_split()
    t0 = time.perf_counter()
    out = step(re, im, anc)
    force_fetch(out)
    log(f"config-4 compile+first {time.perf_counter()-t0:.1f}s")
    fixes = np.asarray(out.fixes_enu)
    err = np.linalg.norm(fixes[sub, :2] - emitter[:2])
    w = np.asarray(out.weights)
    quiet = (sub + 8) % cfg.num_subchannels
    log(f"subchannel {sub} fix err {err:.1f} m (sub-sample = "
        f"{C/cfg.sub_rate_hz:.0f} m); weights active {w[sub].mean():.3f} "
        f"vs quiet {w[quiet].mean():.3f}")
    ok = err < 500.0 and w[sub].mean() > 2 * w[quiet].mean()
    log(f"phase 1 {'OK' if ok else 'FAIL'}")

    # ---- phase 2: fetch-closed epochs
    for e in range(3):
        t0 = time.perf_counter()
        outs = [step(re, im, anc) for _ in range(10)]
        force_fetch(outs)
        dt = (time.perf_counter() - t0) / 10
        log(f"epoch {e}: {dt*1e3:.2f} ms/block = "
            f"{b * n / dt / 1e6:.1f} wide MS/s, "
            f"{cfg.num_subchannels * cfg.num_pairs / dt / 1e3:.0f}k pairs/s")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
