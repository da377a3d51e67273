"""Quickstart: simulate a Plummer sphere and track energy drift.

    python examples/quickstart.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import n_body_problem_tpu as nb

cfg = nb.SimConfig(dt=0.008)                 # the reference's physics defaults
state = nb.models.plummer(8192, seed=0)
sim = nb.Simulation(cfg, state)

d0 = sim.diagnostics()
print(f"N={sim.state.n_real}  E0={d0['energy']:.6e}  solver={cfg.solver}")

for block in range(5):
    sim.run(200)
    d = sim.diagnostics()
    drift = (d["energy"] - d0["energy"]) / abs(d0["energy"])
    print(f"step {d['step']:>5d}  E={d['energy']:.6e}  drift={drift:+.2e}  "
          f"|p|={np.linalg.norm(d['momentum']):.2e}")

print(f"wall: {sim.wall_seconds:.2f}s "
      f"({sim.pairs_per_step() * 1000 / sim.wall_seconds:.3e} pairs/s)")
