"""Round-4 24k/32k crossover-bracket re-measurement (VERDICT r3 #6).

The VMEM-resident far kernel + row-form VIP merge moved the tuned 20,480
leg 1.794 -> 1.553 ms/step (1.039x the 4090 baseline); this runner
re-measures the 24,576 / 32,768 brackets at the DEFAULT tau (the tight
~1.5e-3 error class; the starred tau=5e-4 rows in BASELINE.md were the
looser ~4e-3 class) under the same sustained protocol + fixed-depth probe
to see whether the matched-error crossover is now below the reference's
own workload everywhere.

Run detached: nohup python tools/ab_bracket_r4.py > /tmp/ab_bracket.log 2>&1 &
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BASELINE, bench_config  # noqa: E402
from n_body_problem_tpu.config import tuned_tree_overrides  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "validation", "tune_small_n_20260819.jsonl")
LEGS = [
    ("24k_tuned_fixedprobe", 24576, tuned_tree_overrides(24576)),
    ("32k_tuned_fixedprobe", 32768, tuned_tree_overrides(32768)),
]

for tag, n, over in LEGS:
    try:
        r = bench_config(n, "treecode", steps=1024, chunks=1, windows=1,
                         **over)
        r["leg"] = tag
        r["overrides"] = over
        r["vs_baseline"] = r["pairs_per_sec"] / BASELINE
    except Exception as e:  # relay wedges must not kill later legs
        r = {"leg": tag, "error": repr(e)}
    with open(OUT, "a") as f:
        f.write(json.dumps(r) + "\n")
    print(json.dumps(r), flush=True)
