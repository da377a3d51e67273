"""Virtual-CPU-mesh scaled-run measurement (VERDICT r1 #4's last item).

Runs the sharded solvers at N up to 262,144 on D virtual CPU devices
(interpret-off XLA path — the exact ring and the dense treecode both run
through XLA collectives, no Pallas) and records ms/step per (N, D).
Absolute numbers are CPU-host numbers and meaningless for TPU perf; the
point is that the DISTRIBUTED code paths execute real multi-device
programs at flagship scale and stay finite, and that per-chip work
shrinks with D.

    python tools/mesh_scaling.py [--steps 2] [--out validation/mesh_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in _flags:
    # The host serializes the virtual devices' programs, so at flagship N
    # the inter-device skew at each collective exceeds XLA CPU's default
    # 40 s rendezvous termination — a simulation artifact, not a hang.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--out", default="validation/mesh_scaling.json")
    args = ap.parse_args()

    from n_body_problem_tpu import SimConfig, models
    from n_body_problem_tpu.parallel.mesh import make_ring_mesh
    from n_body_problem_tpu.parallel.sharded import ShardedSimulation

    rows = []
    configs = [
        # (N, D, strategy) — half_ring is the exact cross-chip solver;
        # treecode (dense path; the flat path's Pallas kernels need the
        # TPU) is the hierarchical one, and the one actually intended for
        # flagship N. The exact solvers' host-CPU step time scales
        # ~N^2.7 (measured 0.7 s at 8k, 5.4 s at 16k, 36 s at 32k per
        # step on the 8-device virtual mesh — the serialized host pays
        # N^2 flops plus (N/D)^2 buffer thrash), so the exact leg stops
        # at 32k and the N=262,144 scaled-run validation uses the
        # treecode. This is a correctness-at-scale program execution,
        # not a benchmark: host-CPU throughput is ~3 orders below TPU.
        (16384, 8, "half_ring"),
        (32768, 8, "half_ring"),
        (65536, 8, "treecode"),
        (262144, 8, "treecode"),
    ]
    for n, d, strategy in configs:
        mesh = make_ring_mesh(d)
        kw = {}
        if strategy == "treecode":
            kw = dict(tree_vip_tiles=32, tree_rebuild_every=args.steps,
                      tree_flat_cap=-1)
        cfg = SimConfig(solver="direct", donate=False, **kw) \
            if strategy != "treecode" else SimConfig(
                solver="treecode", donate=False, **kw)
        sim = ShardedSimulation(cfg, models.plummer(n, seed=0), mesh,
                                strategy=strategy)
        sim.run(args.steps)  # compile + warm
        t0 = time.perf_counter()
        sim.run(args.steps)
        np.asarray(sim.state.pos[0])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        finite = bool(np.isfinite(np.asarray(sim.state.pos)).all())
        rows.append(dict(n=n, devices=d, strategy=strategy,
                         ms_per_step_cpu=round(ms, 1), finite=finite))
        print(f"mesh_scaling: N={n} D={d} {strategy}: {ms:.1f} ms/step "
              f"finite={finite}", file=sys.stderr)
        assert finite

    out = dict(backend="cpu-virtual-mesh", steps=args.steps, results=rows)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
