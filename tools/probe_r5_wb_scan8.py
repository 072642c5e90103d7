"""Interleaved A/B: wideband bench scan-4 (shipped) vs scan-8.

Same-process, alternating, two rounds each — the only trustworthy
ranking methodology on the tunneled chip (CLAUDE.md)."""
import sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from bench import run_wideband_bench

for label, k in (("scan4-a", 4), ("scan8-a", 8), ("scan4-b", 4), ("scan8-b", 8)):
    ms, wide, pairs = run_wideband_bench(iters=8, scan_blocks=k)
    print(f"{label}: {ms:.2f} ms/block, {wide/1e6:.1f} wide MS/s, "
          f"{pairs/1e3:.0f}k pairs/s", flush=True)
