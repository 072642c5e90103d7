"""Central service load test: N buoys × M detections/s, waveform mode on.

Measures the live service plane the way the reference's comprehensive
validation watches its stack (`/root/reference/tests/
test_comprehensive_system_validation.py:18-57`), but under a *controlled
offered load*: N WebSocket clients send `signal_detection` messages with
real u8-encoded IQ snippets at a fixed aggregate rate for T seconds; the
run reports sustained throughput, the correlation working-set bound, and
fix-latency p50/p95 from `/metrics`.

Usage:
    python tools/load_central.py [--buoys 4] [--rate 20] [--secs 30]
    python tools/load_central.py --sweep   # find the saturation point

Each dwell (1 s cadence) shares one `iq_anchor_ns` across buoys so the
engine's same-dwell clustering correlates them (waveform GCC-PHAT mode).
Prints one JSON line per measured rate.
"""

import argparse
import asyncio
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def run_load(num_buoys: int, rate_per_s: float, duration_s: float,
                   ws_port: int = 18761, http_port: int = 18762) -> dict:
    import numpy as np
    import websockets

    from radio_mapper_tpu import sim
    from radio_mapper_tpu.runtime.central import CentralProcessor
    from radio_mapper_tpu.runtime.datamodel import (
        NumpyJSONEncoder,
        SignalDetection,
        detection_wire_dict,
        utc_now_iso,
    )

    scen = sim.default_scenario(signal="noise", bandwidth_hz=150e3,
                                snr_db=25.0, seed=8)
    cap = sim.synthesize(scen)
    # Pad buoy list by replicating the scenario geometry with small offsets
    buoys = []
    for k in range(num_buoys):
        b = scen.buoys[k % len(scen.buoys)]
        buoys.append((f"load-{k}", b.lat + 1e-4 * (k // len(scen.buoys)),
                      b.lng, cap.iq[k % len(scen.buoys)][:2048]))

    central = CentralProcessor(host="127.0.0.1", ws_port=ws_port,
                               http_port=http_port, min_nodes=3)
    await central.start()
    # Pre-warm the engine's GCC jit for this (B, n, lag) signature so the
    # measured latency is solve time, not first-trace time.
    from radio_mapper_tpu.runtime.datamodel import BuoyPosition

    warm_engine = central.engine
    for bid, lat, lng, _ in buoys:
        warm_engine.register_buoy(BuoyPosition(buoy_id=bid, lat=lat, lng=lng))
    warm_dets = [
        SignalDetection(
            buoy_id=bid, frequency_mhz=121.5, signal_strength_dbm=-50.0,
            timestamp_utc=utc_now_iso(), gps_timestamp_ns=1, lat=lat, lng=lng,
            confidence=0.9, signal_type="emergency", iq_samples=iq,
            iq_sample_rate_hz=scen.sample_rate_hz, iq_anchor_ns=1,
        )
        for bid, lat, lng, iq in buoys
    ]
    warm_engine.process_signal_detections(warm_dets)

    sent = 0
    try:
        conns = []
        for bid, lat, lng, _ in buoys:
            ws = await websockets.connect(f"ws://127.0.0.1:{ws_port}")
            # flat registration shape (reference parity; see buoy.py:389)
            await ws.send(json.dumps({
                "type": "node_registration", "node_id": bid,
                "lat": lat, "lng": lng, "capabilities": ["detect", "gcc_phat"],
            }))
            conns.append(ws)

        async def drain(ws):
            # central broadcasts every triangulation_result to every
            # registered node; an unread client socket would fill the recv
            # queue and backpressure the correlation worker mid-pass.
            try:
                async for _ in ws:
                    pass
            except Exception:
                pass

        drains = [asyncio.create_task(drain(ws)) for ws in conns]

        interval = num_buoys / rate_per_s  # per-buoy send period
        t_end = time.monotonic() + duration_s
        recent_peak = 0

        async def sender(idx):
            nonlocal sent, recent_peak
            bid, lat, lng, iq = buoys[idx]
            ws = conns[idx]
            while time.monotonic() < t_end:
                anchor = int(time.time()) * 1_000_000_000  # shared dwell
                det = SignalDetection(
                    buoy_id=bid, frequency_mhz=121.5,
                    signal_strength_dbm=-50.0, timestamp_utc=utc_now_iso(),
                    gps_timestamp_ns=anchor, lat=lat, lng=lng,
                    confidence=0.9, signal_type="emergency", iq_samples=iq,
                    iq_sample_rate_hz=scen.sample_rate_hz, iq_anchor_ns=anchor,
                )
                await ws.send(json.dumps(
                    {"type": "signal_detection",
                     "data": detection_wire_dict(det, "u8")},
                    cls=NumpyJSONEncoder,
                ))
                sent += 1
                recent_peak = max(recent_peak, len(central._recent))
                await asyncio.sleep(interval)

        t0 = time.monotonic()
        await asyncio.gather(*(sender(k) for k in range(len(buoys))))
        # drain: give the handler a moment to finish queued correlations
        await asyncio.sleep(2.0)
        elapsed = time.monotonic() - t0

        def fetch_metrics():
            # in a thread: a blocking urlopen on the event loop would
            # deadlock against the aiohttp server running on that loop
            with urllib.request.urlopen(
                f"http://127.0.0.1:{http_port}/metrics"
            ) as r:
                return r.read().decode()

        metrics_text = await asyncio.to_thread(fetch_metrics)

        def metric(name, default=0.0):
            for line in metrics_text.splitlines():
                if line.startswith(name + " ") or line.startswith(name + "{"):
                    try:
                        return float(line.rsplit(" ", 1)[1])
                    except ValueError:
                        pass
            return default

        received = metric("detections_received")
        fixes = metric("fixes_computed")
        p50 = metric('fix_latency_seconds{quantile="0.5"}')
        p95 = metric('fix_latency_seconds{quantile="0.95"}')
        for ws in conns:
            await ws.close()
        for t in drains:
            t.cancel()
    finally:
        await central.stop()

    return {
        "buoys": num_buoys,
        "offered_rate_per_s": rate_per_s,
        "secs": round(elapsed, 1),
        "sent": sent,
        "received": int(received),
        "received_rate_per_s": round(received / elapsed, 1),
        "fixes": int(fixes),
        "fix_latency_p50_s": round(p50, 3),
        "fix_latency_p95_s": round(p95, 3),
        "recent_working_set_peak": recent_peak,
        # sustained requires that fixes actually happened (p95=0.0 just
        # means the latency metric never fired — a dead fix path must not
        # read as "sustained")
        "sustained": bool(
            received >= 0.95 * sent and fixes > 0 and 0.0 < p95 < 5.0
        ),
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # service plane is host-side
    ap = argparse.ArgumentParser()
    ap.add_argument("--buoys", type=int, default=4)
    ap.add_argument("--rate", type=float, default=20.0)
    ap.add_argument("--secs", type=float, default=30.0)
    ap.add_argument("--sweep", action="store_true",
                    help="double the rate until the service saturates")
    args = ap.parse_args()

    if args.sweep:
        rate = args.rate
        while True:
            res = asyncio.run(run_load(args.buoys, rate, args.secs))
            print(json.dumps(res), flush=True)
            if not res["sustained"] or rate > 2000:
                break
            rate *= 2
    else:
        print(json.dumps(asyncio.run(run_load(args.buoys, args.rate, args.secs))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
