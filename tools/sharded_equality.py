"""Multi-step sharded==single-chip equality at real scale (VERDICT r2 #5,
r3 #3).

Runs BOTH sharded treecode production paths for >= 2 rebuild cadences on
a virtual CPU mesh at N=65,536 / D=8 against the single-chip run of the
same config, and records the agreement in
``validation/sharded_equality_65k.json``:

- ``flat``: per-chip compacted columnar near work lists, replicated
  sources, multi-operand-sort global resort, psum'd VIP reactions;
- ``hier``: the round-3 production far field on top — per-chip compacted
  multi-level far node lists from globally-redundant level summaries and
  the replicated a_med threshold.

The in-CI equivalents run the same comparison at N=4,096-8,192 (D=8 and
D=16, tests/test_parallel.py) — this artifact extends it to the scale
the multi-chip claim is made at. Capacities are sized so NEITHER side
sheds (capacity = K_t * max_near on both sides ⇒ identical open sets
row by row); the hier far caps use the same no-overflow construction as
tests/test_parallel.py::test_sharded_hier_treecode_matches_single_chip.

Usage:  python tools/sharded_equality.py [--n 65536] [--devices 8]
        [--paths flat,hier]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--rebuild-every", type=int, default=4)
    ap.add_argument("--paths", default="flat,hier",
                    help="comma list: flat, hier")
    ap.add_argument("--out", default="validation/sharded_equality_65k.json")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from n_body_problem_tpu import SimConfig, Simulation, models
    from n_body_problem_tpu.ops import treecode as tc
    from n_body_problem_tpu.parallel import make_ring_mesh
    from n_body_problem_tpu.parallel.sharded import ShardedSimulation

    n = args.n
    # Capacity = K_t * max_near on both sides: no overflow anywhere, so
    # per-chip and whole-population lists cover identical open sets.
    configs = {
        "flat": SimConfig(solver="treecode", tree_vip_tiles=64,
                          tree_rebuild_every=args.rebuild_every,
                          tree_src_tile=64, tree_max_near=128,
                          tree_flat_cap=(n // 32) * 128, tree_hier=False,
                          donate=False),
        "hier": SimConfig(solver="treecode", tree_vip_tiles=64,
                          tree_rebuild_every=args.rebuild_every,
                          tree_src_tile=64, tree_max_near=128,
                          tree_tile=128, tree_hier=True,
                          tree_flat_cap=(n // 128) * 64 * 16,
                          tree_far_cap=(n // 128) * tc.FAR_ENTRIES * 16,
                          donate=False),
    }
    mesh = make_ring_mesh(args.devices)

    # Merge with an existing artifact so a single-path rerun (e.g.
    # --paths hier after a kill mid-hier) cannot clobber the other
    # path's finished record.
    out = pathlib.Path(args.out)
    records: dict[str, dict] = (
        json.loads(out.read_text()) if out.exists() else {}
    )
    for path in args.paths.split(","):
        cfg = configs[path]
        t0 = time.time()
        ssim = ShardedSimulation(cfg, models.plummer(n, seed=43), mesh,
                                 strategy="treecode")
        if path == "hier":
            assert ssim.cfg.tree_far_max > 0, "hier path not engaged"
        ssim.run(args.steps)
        t_sharded = time.time() - t0

        t0 = time.time()
        ref = Simulation(cfg, models.plummer(n, seed=43))
        ref.run(args.steps)
        t_single = time.time() - t0

        a = np.asarray(ssim.state.pos[:n])
        b = np.asarray(ref.state.pos[:n])
        inv_a = np.empty(n, int)
        inv_a[np.asarray(ssim.sort_perm)] = np.arange(n)
        inv_b = np.empty(n, int)
        inv_b[np.asarray(ref.sort_perm)] = np.arange(n)
        delta = np.abs(a[inv_a] - b[inv_b])
        scale = np.abs(b[inv_b]).max()
        d = ssim.diagnostics()
        rec = {
            "n": n,
            "devices": args.devices,
            "steps": args.steps,
            "rebuild_every": args.rebuild_every,
            "resorts_fired": args.steps // args.rebuild_every,
            "max_abs_delta": float(delta.max()),
            "max_rel_delta": float(delta.max() / scale),
            "sharded_overspeed": int(d["overspeed"]),
            "sharded_energy_finite": bool(np.isfinite(d["energy"])),
            "wall_s_sharded_cpu_mesh": round(t_sharded, 1),
            "wall_s_single_chip_cpu": round(t_single, 1),
            "passes": bool(delta.max() / scale < 5e-4),
        }
        records[path] = rec
        print(json.dumps({path: rec}), flush=True)
        # Flush after EVERY path: a kill mid-hier must not lose the
        # finished flat record (the round-4 run died exactly this way).
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(records, indent=2) + "\n")
    for path, rec in records.items():
        assert rec["passes"], f"{path}: sharded != single-chip beyond tolerance"


if __name__ == "__main__":
    main()
