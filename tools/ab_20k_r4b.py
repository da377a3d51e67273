"""Round-4 N=20,480 decision leg: row-form VIP merge + fixed-depth probe.

Measures the exact bench-suite protocol (steps=1024, chunks=1, windows=1,
probe on a host-copied post-warmup snapshot at fixed 1024-step depth) for
the tuned config. Timing already landed 2026-08-19: vip16 1.553 ms/step
(1.039x the 4090 baseline), vip8 1.650 ms — vip16 stays the tuned config;
this rerun captures the error envelope the first attempt lost to donated
buffers. The 2026-08-19 bisect proved the earlier elevated p99 (4.7e-3)
was a probe-depth artifact (bit-identical across code versions).

Run detached: nohup python tools/ab_20k_r4b.py > /tmp/ab20k_r4b.log 2>&1 &
(PYTHONPATH=/root/repo:/root/.axon_site per CLAUDE.md)
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
    ("rowmerge_vip16_fixedprobe", dict(base)),
]

for tag, over in LEGS:
    try:
        r = bench_config(20480, "treecode", steps=1024, chunks=1, windows=1,
                         **over)
        r["leg"] = tag
        r["overrides"] = over
        r["vs_baseline"] = r["pairs_per_sec"] / BASELINE
    except Exception as e:  # relay wedges must not kill later legs
        r = {"leg": tag, "error": repr(e)}
    with open(OUT, "a") as f:
        f.write(json.dumps(r) + "\n")
    print(json.dumps(r), flush=True)
