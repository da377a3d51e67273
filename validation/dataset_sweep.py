"""Run every reference dataset (0-5) for a few hundred steps on the current
backend, recording step rate and sanity checks. Evidence artifact:
``validation/dataset_sweep.json``.

    python validation/dataset_sweep.py --data-dir /path/to/data --steps 200
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="validation/dataset_sweep.json")
    args = ap.parse_args()

    import numpy as np

    import jax
    from n_body_problem_tpu import SimConfig, Simulation
    from n_body_problem_tpu.io.datasets import DATASETS, load_dataset

    results = []
    for ds_id, spec in sorted(DATASETS.items()):
        try:
            state, _ = load_dataset(ds_id, directory=args.data_dir)
        except FileNotFoundError as e:
            results.append({"dataset": ds_id, "name": spec.name, "status": f"missing: {e}"})
            continue
        cfg = SimConfig(solver="auto")
        sim = Simulation(cfg, state)
        sim.run(args.steps)   # compile + warm
        _ = float(np.asarray(sim.state.pos[0, 0]))
        t0 = time.perf_counter()
        sim.run(args.steps)
        _ = float(np.asarray(sim.state.pos[0, 0]))
        dt = time.perf_counter() - t0
        pos = np.asarray(sim.state.pos)
        rec = {
            "dataset": ds_id,
            "name": spec.name,
            "status": "ok",
            "n_real": sim.state.n_real,
            "n_padded": sim.state.n,
            "steps": 2 * args.steps,
            "ms_per_step": dt / args.steps * 1e3,
            "pairs_per_sec": sim.state.n ** 2 * args.steps / dt,
            "finite": bool(np.isfinite(pos).all()),
            "fallback_model": not bool(spec.filename) or None,
        }
        results.append(rec)
        print(f"dataset {ds_id} ({spec.name}): n={rec['n_real']} "
              f"{rec['ms_per_step']:.2f} ms/step finite={rec['finite']}",
              file=sys.stderr)
    report = {"backend": jax.default_backend(), "results": results}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"datasets_ok": sum(r.get("status") == "ok" for r in results)}))


if __name__ == "__main__":
    main()
