"""TPU A/B: source-tile size 32 vs 64, windowed step time at one N.

The round-3 CPU census (docs/acceptance.md, "Source-tile size" table)
modelled a 26% cost saving at N=262,144 from halving the leaf tile:
near pairs/row 16,440 -> 9,479 for +44% far evals. The model ignores
DMA granularity (2x more half-size panel fetches) and per-level fixed
costs, so the default flips only on this measured A/B.

Usage: python tools/ab_src.py [N] [steps]   (run on the real TPU)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BASELINE, bench_config  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
for src in (64, 32):
    r = bench_config(n, "treecode", steps=steps, tree_src_tile=src)
    r.update(src_tile=src, vs_baseline=r["pairs_per_sec"] / BASELINE)
    print(json.dumps(r), flush=True)
