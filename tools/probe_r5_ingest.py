"""Ingest per-leg budget + tunnel-bandwidth quantification (VERDICT r4 item 4).

Three measurements, one process:

1. TUNNEL TRANSFER BANDWIDTH — sustained host→device `device_put`
   throughput at the 8-ch and 32-ch block sizes (each put closed by an
   on-device reduce; one trailing fetch). This is the hard ceiling no
   ingest design can beat on this link: a 32-ch flagship stream needs
   1.23 GB/s of uint8; the r4 loopback bench already proved the
   REPO-OWNED host leg (ring → parallel drain → slot) sustains
   1.4+ GB/s, so whatever gap remains here is the tunnel, not the
   design.

2. 1-CH RUNG TWICE BACK-TO-BACK — the r3→r4 "regression" (0.964 → 0.805
   real-time) on identical code paths: if two same-process consecutive
   runs spread comparably, the cross-round delta is host/tunnel load
   sensitivity (the 2-vCPU box caveat, CLAUDE.md), not a code change.

3. 8-CH RUNG with the per-leg budget printed against the block period.

Run in a FRESH process:
  nohup python tools/probe_r5_ingest.py > docs/probe_logs/ab_r5_ingest.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def transfer_bandwidth(block_bytes: int, iters: int = 12) -> float:
    import jax
    import jax.numpy as jnp

    from radio_mapper_tpu.utils.device import force_fetch

    rng = np.random.default_rng(0)
    blocks = [
        rng.integers(0, 256, size=block_bytes, dtype=np.uint8)
        for _ in range(iters)
    ]
    consume = jax.jit(lambda a: jnp.sum(a[::4097].astype(jnp.float32)))
    # warm
    force_fetch(consume(jax.device_put(blocks[0])))
    t0 = time.perf_counter()
    outs = [consume(jax.device_put(b)) for b in blocks]
    force_fetch(outs)
    dt = time.perf_counter() - t0
    rate = block_bytes * iters / dt
    log(
        f"device_put sustained @ {block_bytes/1e6:.1f} MB blocks: "
        f"{rate/1e6:.1f} MB/s ({dt/iters*1e3:.1f} ms/block)"
    )
    return rate


def ingest_rung(channels: int, steps: int = 30, **kw):
    from bench import run_ingest_bench

    st = run_ingest_bench(channels=channels, steps=steps, **kw)
    budget_ms = 16_384 / 2_400_000.0 * 1e3 * max(1, kw.get("blocks_per_dispatch", 1))
    log(
        f"ingest {channels}ch: {st.real_time_ratio:.3f}x real time, "
        f"dropped_bytes={st.dropped_bytes}, budget {budget_ms:.2f} ms/block "
        f"vs host {st.host_read_ms_per_step:.2f} + put-issue "
        f"{st.transfer_ms_per_step:.2f} ms/step "
        f"(sustained {st.sustained_samples_per_s/1e6:.1f} MS/s)"
    )
    return st


def main():
    import jax

    log(f"backend: {jax.default_backend()}")

    # 1. tunnel ceiling at the two block sizes the ladder uses
    bw32 = transfer_bandwidth(32 * 8 * 2 * 16_384)  # 8.4 MB (32-ch block)
    bw8 = transfer_bandwidth(8 * 8 * 2 * 16_384)  # 2.1 MB (8-ch block)
    for ch, bw in ((32, bw32), (8, bw8)):
        need = ch * 8 * 2 * 2_400_000.0
        log(
            f"  {ch}ch needs {need/1e6:.0f} MB/s of uint8; tunnel gives "
            f"{bw/1e6:.0f} MB/s → ceiling {bw/need:.2f}x real time "
            f"(design-independent)"
        )

    # 2. 1-ch rung twice back-to-back (same code, same process)
    r1 = ingest_rung(1)
    r2 = ingest_rung(1)
    spread = abs(r1.real_time_ratio - r2.real_time_ratio)
    log(
        f"1ch back-to-back spread: {r1.real_time_ratio:.3f} vs "
        f"{r2.real_time_ratio:.3f} (|Δ|={spread:.3f}; r3→r4 cross-round "
        f"delta was 0.16 — compare)"
    )

    # 3. 8-ch rung per-leg budget
    ingest_rung(8)
    log("done")


if __name__ == "__main__":
    main()
