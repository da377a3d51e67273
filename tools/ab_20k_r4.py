"""Round-4 N=20,480 sweep: post-VMEM-far-kernel knob A/B on the real TPU.

The VMEM-resident far kernel moved the tuned 20,480 step 1.794 -> 1.699
ms; the first vip0 probe measured 1.536 ms (1.05x the 4090 baseline).
This runner re-measures the promising knobs WITH the oracle force-error
probe so the winner can be promoted into config.tuned_tree_overrides
only if it holds the <= ~1.5e-3 p99 class. One JSON line per leg
appended to validation/tune_small_n_20260819.jsonl.

Run detached (each leg = remote compile + 1024 steps + oracle probe,
~5-10 min): nohup python tools/ab_20k_r4.py & (PYTHONPATH per CLAUDE.md)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BASELINE, bench_config  # noqa: E402
from n_body_problem_tpu.config import tuned_tree_overrides  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "validation", "tune_small_n_20260819.jsonl")
base = tuned_tree_overrides(20480)
LEGS = [
    ("vip0", dict(base, tree_vip_tiles=0)),
    ("vip0_rebuild64", dict(base, tree_vip_tiles=0, tree_rebuild_every=64)),
    ("rebuild64", dict(base, tree_rebuild_every=64)),
    ("tile64_vip0", dict(base, tree_tile=64, tree_vip_tiles=0)),
    ("vip8", dict(base, tree_vip_tiles=8)),
]

for tag, over in LEGS:
    try:
        r = bench_config(20480, "treecode", steps=512, chunks=2, windows=1,
                         **over)
        r["leg"] = tag
        r["overrides"] = over
        r["vs_baseline"] = r["pairs_per_sec"] / BASELINE
    except Exception as e:  # relay wedges must not kill later legs
        r = {"leg": tag, "error": repr(e)}
    with open(OUT, "a") as f:
        f.write(json.dumps(r) + "\n")
    print(json.dumps(r), flush=True)
