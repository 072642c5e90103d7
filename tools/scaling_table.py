"""CPU-mesh scaling table: the same GLOBAL problem on 1/2/4/8 devices.

Runs (a) the flagship DP step (full split pipeline, 32 ch × 8 buoys ×
16384, max_lag 512, channels sharded) and (b) the streaming SP step
(channelize with ppermute halos → sub-channel GCC → solve, time axis
sharded) on n ∈ {1, 2, 4, 8} virtual CPU devices and reports wall-clock
plus the analytic collective bytes each step moves per iteration.

Interpretation caveat (recorded with the numbers): all virtual devices
share one host's cores, so wall-clock does NOT show real-chip speedup —
what it shows is that the sharded programs compile/execute at every mesh
size and what the collectives cost. On real hardware the "ch" axis is
embarrassingly parallel (zero collective bytes) and "blk" moves only the
halo bytes listed.

Usage: python tools/scaling_table.py [--iters 3]
Prints one JSON line per (program, n).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
    from radio_mapper_tpu.parallel import mesh as mesh_lib
    from radio_mapper_tpu.parallel.sharded import (
        ShardedStepConfig,
        build_sharded_step_split,
        example_inputs_split,
    )

    devices = jax.devices("cpu")
    assert len(devices) >= 8, "need XLA_FLAGS=--xla_force_host_platform_device_count=8"

    def timed(step, arrays, iters):
        out = step(*arrays)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*arrays)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # ---- flagship DP (channels sharded; zero collective bytes) ----------
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=8, block_len=16_384, sample_rate_hz=2_400_000.0,
            max_lag=512, max_peaks=8, solver_iterations=25,
        )
    )
    re, im, anchors = pipe.example_inputs(batch=(32,), seed=0, split=True)
    re, im, anchors = map(np.asarray, (re, im, anchors))
    for n in (1, 2, 4, 8):
        mesh = mesh_lib.make_mesh((n,), ("ch",), devices=devices[:n])
        dp = NamedSharding(mesh, P("ch"))
        arrays = tuple(jax.device_put(a, dp) for a in (re, im, anchors))
        step = jax.jit(pipe.step_split, in_shardings=(dp, dp, dp))
        dt = timed(step, arrays, args.iters)
        print(json.dumps({
            "program": "flagship_dp", "devices": n,
            "global_shape": "32ch x 8 buoys x 16384, max_lag 512",
            "wall_ms_per_step": round(dt * 1e3, 1),
            "collective_bytes_per_step": 0,
            "note": "pure batch DP: no collectives",
        }), flush=True)

    # ---- streaming SP ("blk" halos) + analytic collective bytes ---------
    cfg = ShardedStepConfig(
        num_channels=8, num_buoys=8, num_subchannels=8,
        taps_per_channel=4, max_lag=24, solver_iterations=8,
    )
    history = (cfg.taps_per_channel - 1) * cfg.num_subchannels
    samples_per_shard = 2048
    for n in (1, 2, 4, 8):
        shape = mesh_lib.balanced_mesh_shape(n)
        mesh = mesh_lib.make_mesh(shape, ("ch", "blk"), devices=devices[:n])
        blk = mesh.shape["blk"]
        # same GLOBAL sample count regardless of n
        per_shard = samples_per_shard * 8 // blk
        step, _ = build_sharded_step_split(mesh, cfg)
        arrays = example_inputs_split(mesh, cfg, samples_per_shard=per_shard)
        dt = timed(step, arrays, args.iters)
        # halo: each blk shard ppermutes `history` samples × (re+im) f32
        # per (channel, buoy) row to its right neighbor
        halo_bytes = (
            0 if blk == 1 else
            (cfg.num_channels // mesh.shape["ch"]) * cfg.num_buoys
            * history * 4 * 2 * blk
        )
        print(json.dumps({
            "program": "streaming_sp", "devices": n,
            "mesh": f"ch={mesh.shape['ch']} x blk={blk}",
            "global_shape": f"8ch x 8 buoys x {samples_per_shard * 8} samples",
            "wall_ms_per_step": round(dt * 1e3, 1),
            "collective_bytes_per_step": halo_bytes,
            "note": "ppermute halo (overlap-save history) only",
        }), flush=True)

    # ---- pair-EP (all_gather spectra + psum normal equations) -----------
    from radio_mapper_tpu.parallel.pair_ep import PairEPConfig, build_pair_ep_step
    from jax.sharding import Mesh

    ep_cfg = PairEPConfig(
        num_buoys=32, block_len=2048, max_lag=128, solver_iterations=10,
    )
    import radio_mapper_tpu.ops.fft as fft_ops
    nfft = fft_ops.friendly_fft_len(ep_cfg.block_len + ep_cfg.max_lag)
    rng = np.random.default_rng(0)
    ep_re = rng.normal(size=(32, 2048)).astype(np.float32)
    ep_im = rng.normal(size=(32, 2048)).astype(np.float32)
    ep_anchors = rng.normal(scale=5_000.0, size=(32, 3)).astype(np.float32)
    ep_anchors[:, 2] = 0.0
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(devices[:n]), ("pair",))
        step, sh, (pi, _pj) = build_pair_ep_step(mesh, ep_cfg)
        arrays = (
            jax.device_put(ep_re, sh[0]),
            jax.device_put(ep_im, sh[1]),
            jax.device_put(ep_anchors, sh[2]),
        )
        dt = timed(step, arrays, args.iters)
        # all_gather: each device contributes B/n spectra rows of nfft f32 x2
        ag_bytes = 0 if n == 1 else 32 * nfft * 4 * 2
        # per LM iteration: g (3) + h (9) + cost (1) floats (pair_ep.py docstring)
        psum_bytes = ep_cfg.solver_iterations * 13 * 4 * (0 if n == 1 else 1)
        print(json.dumps({
            "program": "pair_ep", "devices": n,
            "global_shape": f"32 buoys / {len(pi)} pairs x {ep_cfg.block_len}",
            "wall_ms_per_step": round(dt * 1e3, 1),
            "collective_bytes_per_step": ag_bytes + psum_bytes,
            "note": "all_gather spectra + per-iteration psum",
        }), flush=True)

    # ---- config-5 (r5): the 256-channel north-star program --------------
    c5 = ShardedStepConfig(
        num_channels=256, num_buoys=8, num_subchannels=16,
        sample_rate_hz=2_400_000.0, max_lag=32, taps_per_channel=4,
        solver_iterations=8,
    )
    c5_hist = (c5.taps_per_channel - 1) * c5.num_subchannels
    for n in (1, 2, 4, 8):
        shape = mesh_lib.balanced_mesh_shape(n)
        mesh = mesh_lib.make_mesh(shape, ("ch", "blk"), devices=devices[:n])
        blk = mesh.shape["blk"]
        per_shard = 1024 * 8 // blk  # same global samples regardless of n
        step, _ = build_sharded_step_split(mesh, c5)
        arrays = example_inputs_split(mesh, c5, samples_per_shard=per_shard)
        dt = timed(step, arrays, args.iters)
        halo_bytes = (
            0 if blk == 1 else
            (c5.num_channels // mesh.shape["ch"]) * c5.num_buoys
            * c5_hist * 4 * 2 * blk
        )
        print(json.dumps({
            "program": "config5_256ch", "devices": n,
            "mesh": f"ch={mesh.shape['ch']} x blk={blk}",
            "global_shape": f"256ch x 8 buoys x {1024 * 8} samples",
            "wall_ms_per_step": round(dt * 1e3, 1),
            "collective_bytes_per_step": halo_bytes,
            "note": "the BASELINE configs[4] program (scaled block)",
        }), flush=True)

    # ---- wideband config-4 sharded over subchannels (r4/r5) -------------
    from radio_mapper_tpu.models.wideband import (
        WidebandConfig, build_wideband_sharded_step,
    )

    wb_cfg = WidebandConfig(
        num_buoys=16, wide_rate_hz=2_048_000.0, num_subchannels=8,
        taps_per_channel=4, sub_block=1024, max_lag=48, solver_iterations=6,
    )
    wb_rng = np.random.default_rng(1)
    wb_re = wb_rng.normal(size=(wb_cfg.num_buoys, wb_cfg.wide_block)).astype(np.float32)
    wb_im = wb_rng.normal(size=(wb_cfg.num_buoys, wb_cfg.wide_block)).astype(np.float32)
    wb_anchors = wb_rng.normal(scale=5_000.0, size=(wb_cfg.num_buoys, 3)).astype(np.float32)
    wb_anchors[:, 2] = 0.0
    for n in (1, 2, 4, 8):
        mesh = mesh_lib.make_mesh((n,), ("sub",), devices=devices[:n])
        step, sh = build_wideband_sharded_step(mesh, wb_cfg)
        arrays = (
            jax.device_put(wb_re, sh[0]),
            jax.device_put(wb_im, sh[1]),
            jax.device_put(wb_anchors, sh[2]),
        )
        dt = timed(step, arrays, args.iters)
        print(json.dumps({
            "program": "wideband_sub", "devices": n,
            "global_shape": (
                f"{wb_cfg.num_buoys} buoys x {wb_cfg.num_subchannels} sub / "
                f"{wb_cfg.num_pairs} pairs"
            ),
            "wall_ms_per_step": round(dt * 1e3, 1),
            "collective_bytes_per_step": 0,
            "note": "subchannels embarrassingly parallel after replicated PFB",
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
