"""End-to-end step decomposition at the reference's own workload.

VERDICT r3 #2: the 20,480-body tuned treecode step measures 1.794 ms
against the 4090's published 1.6 ms (``kernel.cu:73``) while the force
stages alone sum to ~1.46 ms — this tool measures exactly where the
remaining time lives, all with scanned windows on the real TPU (the
relay's 20-80 ms dispatch floor makes single-call timing fiction):

  force        scan of force-only steps (cached acceptance lists)
  force+euler  scan of full integrator steps (the chunk_cols body)
  chunk        full production chunk: resort + build + scan(r) force+euler
  resort       scanned multi-operand-sort Z-order resort
  build        scanned acceptance rebuild

chunk - (force+euler) - (resort+build)/r = residual glue. One JSON line
per leg on stdout; run serially on the real TPU (~1 min compile each).

Usage: python tools/decompose_step.py [--n 20480] [--steps 256]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fetch(x) -> float:
    return float(np.asarray(x).ravel()[0])


def timed_scan(make_body, carry, steps: int, warmups: int = 2,
               reps: int = 3) -> float:
    """Best per-step wall time of ``lax.scan(make_body, carry, steps)``.

    ``make_body`` must return a carry of the same structure whose first
    leaf depends on the computation (defeats CSE/hoisting).
    """

    @jax.jit
    def run(c):
        out, _ = lax.scan(lambda c, _: (make_body(c), None), c,
                          length=steps)
        return out

    for _ in range(warmups):
        _fetch(jax.tree_util.tree_leaves(run(carry))[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(jax.tree_util.tree_leaves(run(carry))[0])
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20480)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--tuned", action="store_true", default=True)
    ap.add_argument("--no-tuned", dest="tuned", action="store_false")
    args = ap.parse_args()

    from n_body_problem_tpu import SimConfig, Simulation, models
    from n_body_problem_tpu.config import tuned_tree_overrides
    from n_body_problem_tpu.ops import treecode as tc
    from n_body_problem_tpu.utils.morton import resort_cols

    over = tuned_tree_overrides(args.n) if args.tuned else {}
    cfg = SimConfig(solver="treecode", **over)
    sim = Simulation(cfg, models.plummer(args.n, seed=0))
    cfg, state = sim.cfg, sim.state
    n, src, dt = state.n, cfg.tree_src_tile, cfg.dt
    r = cfg.tree_rebuild_every
    print(f"n={n} src={src} tau={cfg.tree_mac_tau} rebuild={r} "
          f"tile={cfg.tree_tile} hier={cfg.tree_hier}", file=sys.stderr)

    sel = dict(tile=cfg.tree_tile, theta=cfg.tree_theta,
               max_near=cfg.tree_max_near, vip_tiles=cfg.tree_vip_tiles)
    build_kw = dict(slack=cfg.tree_near_slack, flat_cap=cfg.tree_flat_cap,
                    far_max=cfg.tree_far_max, far_cap=cfg.tree_far_cap,
                    mac_tau=cfg.tree_hier_tau, mac_tau0=cfg.tree_mac_tau,
                    union_coarse=cfg.tree_hier_union,
                    eps2=cfg.eps2, compensate=cfg.compensate, **sel)
    acc_kw = dict(eps2=cfg.eps2, compensate=cfg.compensate, G=cfg.G,
                  src_tile=src, far_max=cfg.tree_far_max, **sel)

    xc, yc, zc = state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]
    m = state.mass
    cols0 = (xc, yc, zc,
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
             state.acc[:, 0], state.acc[:, 1], state.acc[:, 2])

    build = functools.partial(tc.build_tree_hier_cols, src_tile=src,
                              **build_kw)
    aux = jax.block_until_ready(jax.jit(build)(xc, yc, zc, m))

    def force(px, py, pz, aux):
        return tc.treecode_acc_hier_cols(px, py, pz, m, aux, **acc_kw)

    legs: dict[str, float] = {}

    # 0) dispatch floor
    legs["floor"] = timed_scan(lambda c: tuple(x * 1.0000001 for x in c),
                               cols0[:3], args.steps)

    # 1) force only (cached lists; bump positions so CSE can't collapse)
    def body_force(c):
        x, y, z = c
        ax, ay, az = force(x, y, z, aux)
        return (x + 1e-30 * ax, y + 1e-30 * ay, z + 1e-30 * az)

    legs["force"] = timed_scan(body_force, cols0[:3], args.steps)

    # 2) force + semi-implicit Euler (the chunk_cols body)
    def body_step(c):
        x, y, z, vx, vy, vz, ax, ay, az = c
        ax, ay, az = force(x, y, z, aux)
        vx = vx + ax * dt
        vy = vy + ay * dt
        vz = vz + az * dt
        return (x + vx * dt, y + vy * dt, z + vz * dt,
                vx, vy, vz, ax, ay, az)

    legs["force_euler"] = timed_scan(body_step, cols0, args.steps)

    # 3) resort alone (12 columns like production: + mass, eps, ids)
    full0 = cols0 + (m, state.eps, jnp.arange(n, dtype=jnp.int32))

    def body_resort(c):
        out = resort_cols(c, n)
        return (out[0] * 1.0000001,) + tuple(out[1:])

    legs["resort"] = timed_scan(body_resort, full0, max(args.steps // 4, 16))

    # 4) build alone
    def body_build(c):
        x, y, z = c
        a = build(x, y, z, m)
        bump = sum(jnp.sum(l[:1].astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(a))
        return (x + 1e-30 * bump, y, z)

    legs["build"] = timed_scan(body_build, cols0[:3],
                               max(args.steps // 8, 8))

    # 5) the full production chunk via sim.run (resort+build+scan(r))
    sim2 = Simulation(cfg, models.plummer(args.n, seed=0))
    sim2.run(args.steps)  # warm the exact (steps) program
    _fetch(sim2.state.pos)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sim2.run(args.steps)
        _fetch(sim2.state.pos)
        best = min(best, time.perf_counter() - t0)
    legs["full_step"] = best / args.steps

    floor = legs["floor"]
    out = {"n": n, "steps": args.steps, "rebuild_every": r,
           **{k: v * 1e3 for k, v in legs.items()}}
    out["integrator_ms"] = (legs["force_euler"] - legs["force"]) * 1e3
    out["amortized_rebuild_ms"] = ((legs["resort"] + legs["build"])
                                   - 2 * floor) / r * 1e3
    out["glue_ms"] = (legs["full_step"] - legs["force_euler"]
                      - ((legs["resort"] + legs["build"]) - 2 * floor) / r
                      ) * 1e3
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
