"""Long-run physics validation (BASELINE.md north star).

Runs the flagship workload for many steps and reports conserved-quantity
drift — the validation the reference never had (its checks were printf
probes + visual inspection, SURVEY.md §4). Prints one JSON report.

    python validate.py --n 20000 --steps 10000 --solver pallas_symmetric
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--check-every", type=int, default=1000)
    ap.add_argument("--solver", default="auto")
    ap.add_argument("--integrator", default="leapfrog")
    ap.add_argument("--dt", type=float, default=0.008)
    ap.add_argument("--dataset", type=int, default=-1,
                    help="load a dataset id instead of a Plummer sphere")
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args()

    import numpy as np

    import jax
    from n_body_problem_tpu import SimConfig, Simulation, diagnostics, models

    cfg = SimConfig(dt=args.dt, solver=args.solver, integrator=args.integrator)
    if args.dataset >= 0:
        from n_body_problem_tpu.io.datasets import load_dataset

        state, _ = load_dataset(args.dataset, directory=args.data_dir)
    else:
        state = models.plummer(args.n, seed=0)

    sim = Simulation(cfg, state)
    d0 = sim.diagnostics()
    e0 = d0["energy"]
    p0 = np.asarray(d0["momentum"])
    L0 = np.asarray(d0["angular_momentum"])
    print(f"validate: n={sim.state.n_real} padded={sim.state.n} "
          f"solver={cfg.solver} E0={e0:.6e}", file=sys.stderr)

    history = []
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        todo = min(args.check_every, args.steps - done)
        sim.run(todo)
        done += todo
        d = sim.diagnostics()
        drift = (d["energy"] - e0) / abs(e0)
        history.append({
            "step": done,
            "energy": d["energy"],
            "rel_energy_drift": drift,
            "momentum_err": float(np.linalg.norm(np.asarray(d["momentum"]) - p0)),
            "angmom_err": float(np.linalg.norm(np.asarray(d["angular_momentum"]) - L0)),
            "overspeed": d["overspeed"],
        })
        print(f"validate: step {done}: drift={drift:+.3e} "
              f"overspeed={d['overspeed']}", file=sys.stderr)
    wall = time.perf_counter() - t0

    report = {
        "metric": "relative energy drift",
        "value": history[-1]["rel_energy_drift"],
        "unit": "dE/E0",
        "steps": args.steps,
        "n": sim.state.n_real,
        "solver": cfg.solver,
        "integrator": cfg.integrator,
        "dt": cfg.dt,
        "wall_seconds": wall,
        "pairs_per_sec": sim.state.n ** 2 * args.steps / wall,
        "max_abs_drift": max(abs(h["rel_energy_drift"]) for h in history),
        "momentum_err_final": history[-1]["momentum_err"],
        "backend": jax.default_backend(),
        "history": history,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
