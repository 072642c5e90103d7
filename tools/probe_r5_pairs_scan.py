"""Interleaved A/B: gcc + EP microbench scan depth 8 (shipped) vs 32.

Both benches share one methodology (VERDICT r4 weak #5); if a depth
change is adopted it must be adopted for BOTH. Inputs are small
(gcc 33.5 MB/block, EP 2 MB/block) so depth-32 stacks are ~1 GB / 64 MB.
"""
import sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from bench import run_gcc_microbench, run_ep_microbench

for rnd in "ab":
    for k in (8, 32):
        r = run_gcc_microbench(iters=30, scan_blocks=k)
        print(f"gcc scan{k}-{rnd}: {r/1e3:.0f}k pairs/s", flush=True)
    for k in (8, 32):
        r = run_ep_microbench(iters=12, scan_blocks=k)
        print(f"ep  scan{k}-{rnd}: {r/1e3:.0f}k pairs/s", flush=True)
