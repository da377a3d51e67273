"""Flagship benchmark: pairwise interactions/sec on one chip.

Workload (BASELINE.json config 3 scale): N=65,536 softened direct-sum
gravity + semi-implicit Euler, the reference's method-C numerics
(eps2=1e-6, compensate=0.1, dt=0.008). Reported metric is directed pair
interactions per second (N^2 per step); ``vs_baseline`` is relative to the
reference's derived RTX 4090 throughput of 2.6e11 directed interactions/s
(BASELINE.md).

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=1)
    # Flagship: the symmetric half-pair kernel (the reference report's
    # acceleration method, TPU-native). "auto" (= blocked all-pairs Pallas)
    # is the fallback for shapes beyond the resident kernel's VMEM budget.
    ap.add_argument("--solver", type=str, default="pallas_symmetric")
    args = ap.parse_args()

    import jax

    from n_body_problem_tpu import SimConfig, Simulation, models

    backend = jax.default_backend()
    cfg = SimConfig(solver=args.solver)
    state = models.plummer(args.n, seed=0)
    sim = Simulation(cfg, state)
    n_padded = sim.state.n

    print(f"bench: backend={backend} n={args.n} padded={n_padded} "
          f"solver={cfg.solver}", file=sys.stderr)

    import numpy as np

    def sync() -> float:
        # The sandbox TPU relay's block_until_ready is a no-op; a host fetch
        # of a device scalar is the only reliable execution barrier.
        return float(np.asarray(sim.state.pos[0, 0]))

    # Warm up with the SAME step count: scan length is a static jit arg, so a
    # different count would push the compile into the timed region.
    for _ in range(max(args.warmup, 1)):
        sim.run(args.steps)
        sync()
    # Best of three timed windows: the sandbox relay adds multi-ms jitter.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sim.run(args.steps)
        sync()
        dt = min(dt, time.perf_counter() - t0)

    ms_per_step = dt / args.steps * 1e3
    # Physical directed pairs (real bodies only): padding is massless
    # bookkeeping, not physics, so it doesn't count toward throughput.
    pairs_per_sec = sim.pairs_per_step() * args.steps / dt
    padded_pairs_per_sec = sim.padded_pairs_per_step() * args.steps / dt

    # Second half of the BASELINE metric: ms/step including a rendered frame
    # (the reference integrates exactly once per rendered frame). Fused
    # step+render inside one scanned device program (Simulation.movie).
    from n_body_problem_tpu.render import OrbitCamera

    cam = OrbitCamera(distance=2.0)
    frames = sim.movie(10, render_every=1, camera=cam, width=1024, height=1024)
    float(np.asarray(frames[0, 0, 0, 0]))  # compile + sync
    t0 = time.perf_counter()
    frames = sim.movie(10, render_every=1, camera=cam, width=1024, height=1024)
    float(np.asarray(frames[0, 0, 0, 0]))
    ms_with_render = (time.perf_counter() - t0) / 10 * 1e3

    baseline = 2.6e11  # RTX 4090 derived directed interactions/s (BASELINE.md)
    print(f"bench: {ms_per_step:.3f} ms/step, {pairs_per_sec:.3e} pairs/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "pairwise interactions/sec/chip at N=65k",
        "value": pairs_per_sec,
        "unit": "pairs/s",
        "vs_baseline": pairs_per_sec / baseline,
        "padded_pairs_per_sec": padded_pairs_per_sec,
        "ms_per_step": ms_per_step,
        "ms_per_step_with_render": ms_with_render,
        "n": args.n,
        "n_padded": n_padded,
        "solver": cfg.solver,
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
