"""TPU A/B: tree_hier_union on/off, windowed step time at one N."""
import sys, json
sys.path.insert(0, "/root/repo")
from bench import BASELINE, bench_config
n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
for union in (True, False):
    r = bench_config(n, "treecode", steps=steps, tree_hier_union=union)
    r.update(union=union, vs_baseline=r["pairs_per_sec"] / BASELINE)
    print(json.dumps(r), flush=True)
