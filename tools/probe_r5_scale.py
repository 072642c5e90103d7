"""On-chip scale probes: config-5 per-shard step time + EP at 256 buoys.

VERDICT r4 items 1 & 5.

Part 1 — config-5 per-shard program (BASELINE configs[4]): the EXACT
`docs/MULTIHOST.md` ShardedStepConfig (256 ch × 8 buoys × 16 subchannels
@ 2.4 MS/s, max_lag 32), built per-shard: a 1-device mesh running the
256/N-channel share a single chip of an N-chip slice would own. Shares
measured: 16 ch (v5p-16 / 16-chip slice) and 32 ch (8-chip slice).
Real-time bar: the step consumes `samples` wide samples per channel —
budget = samples / 2.4 MHz. scan-32 (default since late r5; scan-8 for EP-256) amortizes the dispatch floor the same
way the production stream would.

Part 2 — EP at 256 receivers → 32,640 pairs (4× the config-4 count, the
scale the reference's O(N²) Python loop could never reach): one-chip
scan-amortized pairs/s through the same build_pair_ep_step program the
8-device dryrun shape-checks.

Run in a FRESH process:
  nohup python tools/probe_r5_scale.py > docs/probe_logs/ab_r5_scale.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SAMPLES = 32_768  # wide samples/channel/step → 13.65 ms real-time budget


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def epoch(step, args, iters=8):
    from radio_mapper_tpu.utils.device import force_fetch

    out = step(*args)
    force_fetch(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    force_fetch(outs)
    return (time.perf_counter() - t0) / iters


def config5_shard(channels_share: int, scan: int = 32):
    import jax
    import jax.numpy as jnp
    from radio_mapper_tpu.parallel import mesh as mesh_lib
    from radio_mapper_tpu.parallel.sharded import (
        ShardedStepConfig, build_sharded_step_split,
    )
    from radio_mapper_tpu.utils.device import force_fetch

    mesh = mesh_lib.make_mesh((1, 1), ("ch", "blk"), devices=jax.devices()[:1])
    cfg = ShardedStepConfig(
        num_channels=channels_share,  # this chip's share of the 256
        num_buoys=8,
        num_subchannels=16,
        sample_rate_hz=2_400_000.0,
        max_lag=32,
        taps_per_channel=4,
        solver_iterations=15,
    )
    step, shardings = build_sharded_step_split(mesh, cfg)
    rng = np.random.default_rng(0)
    shape = (cfg.num_channels, cfg.num_buoys, SAMPLES)
    re = jax.device_put(rng.normal(size=shape).astype(np.float32), shardings[0])
    im = jax.device_put(rng.normal(size=shape).astype(np.float32), shardings[1])
    anchors = rng.normal(scale=8_000.0, size=(cfg.num_buoys, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    anchors = jax.device_put(anchors, shardings[2])

    if scan > 1:
        tile = jax.jit(lambda a: jnp.broadcast_to(a, (scan, *a.shape)) * 1.0)
        reK, imK = tile(re), tile(im)

        @jax.jit
        def scan_step(rK, iK, anc):
            return jax.lax.scan(
                lambda c, x: (c, step(x[0], x[1], anc)), 0, (rK, iK)
            )[1]

        args = (reK, imK, anchors)
        t0 = time.perf_counter()
        force_fetch(scan_step(*args))
        log(f"  {channels_share}ch share compile+first {time.perf_counter()-t0:.1f}s")
        ts = sorted(epoch(scan_step, args, iters=6) / scan for _ in range(3))
    else:
        args = (re, im, anchors)
        t0 = time.perf_counter()
        force_fetch(step(*args))
        log(f"  {channels_share}ch share compile+first {time.perf_counter()-t0:.1f}s")
        ts = sorted(epoch(step, args) for _ in range(3))
    dt = ts[len(ts) // 2]
    budget = SAMPLES / 2_400_000.0
    log(
        f"CONFIG5 share={channels_share}ch: {dt*1e3:.2f} ms/step vs "
        f"{budget*1e3:.2f} ms budget → {budget/dt:.2f}x real time "
        f"({256//channels_share}-chip slice)"
    )
    return dt


def ep_256(scan: int = 8):  # 23.7 ms blocks: scan-16 measured +1.5% (ab_r5_ep256_scan) — floor share, as predicted
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from radio_mapper_tpu.parallel.pair_ep import PairEPConfig, build_pair_ep_step
    from radio_mapper_tpu.utils.device import force_fetch

    cfg = PairEPConfig(
        num_buoys=256, block_len=4096, max_lag=256, solver_iterations=10,
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("pair",))
    step, shardings, (pi, _pj) = build_pair_ep_step(mesh, cfg)
    rng = np.random.default_rng(0)
    re = jax.device_put(
        rng.normal(size=(cfg.num_buoys, cfg.block_len)).astype(np.float32),
        shardings[0],
    )
    im = jax.device_put(
        rng.normal(size=(cfg.num_buoys, cfg.block_len)).astype(np.float32),
        shardings[1],
    )
    anchors = rng.normal(scale=5_000.0, size=(cfg.num_buoys, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    anchors = jax.device_put(anchors, shardings[2])
    tile = jax.jit(lambda a: jnp.broadcast_to(a, (scan, *a.shape)) * 1.0)
    reK, imK = tile(re), tile(im)

    @jax.jit
    def scan_step(rK, iK, anc):
        return jax.lax.scan(
            lambda c, x: (c, step(x[0], x[1], anc)), 0, (rK, iK)
        )[1]

    args = (reK, imK, anchors)
    t0 = time.perf_counter()
    force_fetch(scan_step(*args))
    log(f"  EP-256 compile+first {time.perf_counter()-t0:.1f}s")
    ts = sorted(epoch(scan_step, args, iters=5) / scan for _ in range(3))
    dt = ts[len(ts) // 2]
    log(
        f"EP256: {len(pi)} pairs in {dt*1e3:.2f} ms/block = "
        f"{len(pi)/dt/1e6:.2f} M pairs/s scan-amortized "
        f"(vs 1.09 M at 64 buoys r4)"
    )
    return dt


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    for share in (16, 32):
        try:
            config5_shard(share)
        except Exception as e:
            log(f"config5 share {share} FAILED: {e!r}")
    try:
        ep_256()
    except Exception as e:
        log(f"EP-256 FAILED: {e!r}")
    log("done")


if __name__ == "__main__":
    main()
