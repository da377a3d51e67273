"""Flagship benchmark: effective pairwise interactions/sec on one chip.

Default (no args) runs the flagship suite:

1. ``treecode`` at N=524,288 / 262,144 / 65,536 — the headline is the
   largest completed leg: a Barnes-Hut solver whose static-shape
   mass-aware-MAC acceptance runs entirely on dense TPU tiles; effective
   throughput = physical directed pairs N(N-1) per step time, with the
   force-error envelope measured in the same run against an exact oracle
   on 2,048 sampled bodies (so the "effective" claim carries its accuracy
   alongside: ~1e-3 p99 relative force error at the default tau).
2. ``pallas_symmetric`` at N=65,536 — the exact-f32 brute-force flagship
   (the reference report's half-pair method, TPU-native), for the honest
   exact comparison (docs/roofline.md).

``vs_baseline`` compares the headline number to the reference's derived
RTX 4090 throughput of 2.6e11 directed interactions/s (BASELINE.md,
``kernel.cu:73``). With ``--n``/``--solver``, benchmarks that single
configuration instead (same JSON schema, no oracle probe unless the
solver is approximate).

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE = 2.6e11  # derived 4090 directed interactions/s (BASELINE.md)


def _sync(x) -> float:
    # The sandbox TPU relay's block_until_ready is a no-op; a host fetch
    # of a device scalar is the only reliable execution barrier.
    import numpy as np

    return float(np.asarray(x).ravel()[0])


def bench_config(n: int, solver: str, steps: int, warmup: int = 1,
                 probe_error: bool | None = None, windows: int = 3,
                 chunks: int = 1, **cfg_kw) -> dict:
    """Time one configuration; extra kwargs are SimConfig overrides
    (used by tools/tune_small_n.py for the small-N sweep).

    ``chunks`` > 1 times that many SEQUENTIAL ``run(steps)`` calls per
    window (total steps = ``steps * chunks``). The relay's TPU worker
    dies on single device programs much past ~60 s of execution (a
    512-step scan at N=524,288 = ~97 s killed it; measured 2026-08-18),
    so sustained windows must be built from <=~25 s scan chunks. The
    per-chunk dispatch floor (~20-90 ms) biases ms/step by <1% at
    >=128-step chunks, and every rebuild/resort/capacity effect stays
    inside the timed window."""
    import numpy as np

    from n_body_problem_tpu import SimConfig, Simulation, models

    cfg = SimConfig(solver=solver, **cfg_kw)
    sim = Simulation(cfg, models.plummer(n, seed=0))
    print(f"bench: n={n} padded={sim.state.n} solver={solver} "
          f"steps={steps}", file=sys.stderr)

    # Warm up with the SAME step count: scan length is a static jit arg, so
    # a different count would push the compile into the timed region.
    for _ in range(max(warmup, 1)):
        sim.run(steps)
        _sync(sim.state.pos[0, 0])
    # Best of `windows` timed windows: the relay adds multi-ms jitter.
    # (Long sustained windows self-average the jitter; one window is
    # enough there.)
    dt = float("inf")
    total = steps * max(chunks, 1)
    for _ in range(max(windows, 1)):
        t0 = time.perf_counter()
        for _ in range(max(chunks, 1)):
            sim.run(steps)
            _sync(sim.state.pos[0, 0])
        dt = min(dt, time.perf_counter() - t0)

    out = {
        "solver": solver,
        "n": n,
        "n_padded": sim.state.n,
        "steps_timed": total,
        "ms_per_step": dt / total * 1e3,
        "pairs_per_sec": sim.pairs_per_step() * total / dt,
        "padded_pairs_per_sec": sim.padded_pairs_per_step() * total / dt,
    }
    print(f"bench: {out['ms_per_step']:.3f} ms/step, "
          f"{out['pairs_per_sec']:.3e} pairs/s", file=sys.stderr)

    if probe_error is None:
        probe_error = solver == "treecode"
    if probe_error:
        # Accuracy rides along with every effective-throughput claim:
        # exact oracle on sampled bodies of the EVOLVED state. 2,048
        # stride-sampled bodies bound p99 well even for a 524k
        # population: the empirical 99th percentile of m samples has
        # quantile-rank s.e. sqrt(.01*.99/m) ~ 0.22%, i.e. the estimate
        # sits between the true p98.3 and p99.7 (95% CI) regardless of
        # N; stride sampling over the Morton-sorted order is a spatial
        # stratified sample (core and halo covered proportionally), so
        # there is no locality bias for the percentile to hide in.
        from n_body_problem_tpu.ops.forces import pair_accel_tile
        from n_body_problem_tpu.ops.registry import make_force_fn

        state = sim.state
        sub = np.arange(0, state.n, max(state.n // 2048, 1))
        force_fn = make_force_fn(sim.cfg, n=state.n)
        approx = np.asarray(force_fn(state.pos, state.mass))[sub]
        # Chunk the oracle rows: pair_accel_tile materializes (I, N, 3),
        # which OOMs past N ~ 300k at I = 2048. Budget ~1.5 GB of
        # transient per chunk (I*N*12 bytes) so the probe survives N=1M.
        rows = min(512, max(64, int(1.5e9 // (12 * state.n))))
        exact = np.concatenate([
            np.asarray(pair_accel_tile(
                state.pos[sub[a:a + rows]], state.pos, state.mass,
                eps2=cfg.eps2, compensate=cfg.compensate, G=cfg.G,
            )) for a in range(0, len(sub), rows)
        ])
        err = (np.linalg.norm(approx - exact, axis=1)
               / np.maximum(np.linalg.norm(exact, axis=1), 1e-12))
        out["force_err_median"] = float(np.median(err))
        out["force_err_p99"] = float(np.percentile(err, 99))
        print(f"bench: force err median {out['force_err_median']:.2e} "
              f"p99 {out['force_err_p99']:.2e}", file=sys.stderr)
    return out


def bench_render(n: int, solver: str) -> float:
    """ms/step including a rendered frame (the reference integrates once
    per rendered frame) — fused step+render in one scanned program."""
    from n_body_problem_tpu import SimConfig, Simulation, models
    from n_body_problem_tpu.render import OrbitCamera

    sim = Simulation(SimConfig(solver=solver), models.plummer(n, seed=0))
    cam = OrbitCamera(distance=2.0)
    frames = sim.movie(10, render_every=1, camera=cam, width=1024, height=1024)
    _sync(frames[0, 0, 0, 0])  # compile + sync
    t0 = time.perf_counter()
    frames = sim.movie(10, render_every=1, camera=cam, width=1024, height=1024)
    _sync(frames[0, 0, 0, 0])
    return (time.perf_counter() - t0) / 10 * 1e3


def run_single(n: int, solver: str, steps: int = 0, chunks: int = 1,
               windows: int = 3) -> dict:
    """Benchmark one configuration; returns (and prints) the JSON record.

    The ``nbody bench`` CLI subcommand calls this directly (it used to
    rewrite ``sys.argv`` and re-enter :func:`main`).
    """
    import jax

    n = n or 65536
    solver = solver or "pallas_symmetric"
    steps = steps or (8 if n > 131072 else 16)
    r = bench_config(n, solver, steps, chunks=chunks, windows=windows)
    r.update({
        "metric": f"pairwise interactions/sec/chip ({solver}, N={n})",
        "value": r["pairs_per_sec"],
        "unit": "pairs/s",
        "vs_baseline": r["pairs_per_sec"] / BASELINE,
        "backend": jax.default_backend(),
    })
    print(json.dumps(r))
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=0,
                    help="single-config mode: body count")
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--solver", type=str, default="")
    ap.add_argument("--chunks", type=int, default=1,
                    help="sequential run(steps) calls per timed window "
                         "(sustained mode; keep each scan <= ~25 s)")
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()

    if args.n or args.solver:
        run_single(args.n, args.solver, args.steps, chunks=args.chunks,
                   windows=args.windows)
        return

    # ---- flagship suite ----
    # 32-step windows: the sandbox relay has a ~20-90 ms fixed dispatch
    # cost per run() call; an 8-step window inflated ms/step by ~10%.
    # Every leg is individually fault-tolerant (the relay occasionally
    # wedges at the largest sizes); the headline is the LARGEST treecode
    # leg that completed — effective throughput grows with N for a
    # sub-quadratic solver, and the accuracy envelope rides along.
    def safe(fn, *a, **kw):
        try:
            return fn(*a, **kw)
        except Exception as e:  # pragma: no cover - relay-dependent
            print(f"bench: leg failed: {e!r}", file=sys.stderr)
            return None

    # Proven scales run FIRST: a wedged relay at the frontier N=1M leg
    # (round 1 saw the relay's TPU worker die on a 1M job) must not
    # take the whole suite down with it, so 1M goes last in each group.
    tree524 = safe(bench_config, 524288, "treecode", steps=args.steps or 32)
    tree = safe(bench_config, 262144, "treecode", steps=args.steps or 32)
    tree65 = safe(bench_config, 65536, "treecode", steps=args.steps or 128)
    # Sustained legs (VERDICT r2 #2): hundreds of steps through run() —
    # every rebuild, resort and capacity-drift effect inside the timed
    # window, compile excluded by the same-length warmup. A >=512-step
    # window self-averages the relay's ~20-90 ms dispatch jitter to
    # <0.2 ms/step, so one timed window suffices. The headline quotes
    # the SUSTAINED rate of the largest completed leg.
    # Chunked windows: the relay kills device programs much past ~60 s,
    # so each sustained window is several sequential <=~25 s scans (see
    # bench_config docstring).
    sus524 = safe(bench_config, 524288, "treecode", steps=128, chunks=4,
                  windows=1)
    sus262 = safe(bench_config, 262144, "treecode", steps=256, chunks=2,
                  windows=1)
    sus65 = safe(bench_config, 65536, "treecode", steps=512, chunks=2,
                 windows=1)
    # The reference's own workload size (VERDICT r2 #3): dataset 0 is
    # N=20,225 padded to 20,480 here; its 1.6 ms/step on the 4090 is the
    # only number the reference ever published (kernel.cu:73). The leg
    # runs the measured small-N tuned config (tools/tune_small_n.py
    # sweep: 2.57 -> 1.79 ms/step; see config.tuned_tree_overrides).
    from n_body_problem_tpu.config import tuned_tree_overrides

    tree20 = safe(bench_config, 20480, "treecode", steps=args.steps or 256,
                  **tuned_tree_overrides(20480))
    sus20 = safe(bench_config, 20480, "treecode", steps=512, chunks=2,
                 windows=1, **tuned_tree_overrides(20480))
    exact20 = safe(bench_config, 20480, "pallas_symmetric",
                   steps=args.steps or 64)
    exact = safe(bench_config, 65536, "pallas_symmetric",
                 steps=args.steps or 16)
    ms_render = safe(bench_render, 65536, "pallas_symmetric")
    # Frontier N=1M legs LAST (see ordering note above).
    tree1m = safe(bench_config, 1048576, "treecode", steps=args.steps or 16)
    # 48-step chunks: 1M runs ~470 ms/step, so 64-step chunks (~30 s)
    # graze the relay's ~60 s program kill; 48 (~23 s) is the safe size
    # (measured 2026-08-18: 467.9 ms/step sustained = 9.04x baseline).
    sus1m = (safe(bench_config, 1048576, "treecode", steps=48, chunks=5,
                  windows=1)
             if tree1m is not None else None)

    # Headline = the SUSTAINED rate of the largest completed leg
    # (windowed numbers ride alongside; a multiplier that only holds for
    # 32-step windows is soft — VERDICT r2).
    head = next((t for t in (sus1m, sus524, sus262, sus65,
                             tree1m, tree524, tree, tree65)
                 if t is not None), None)
    if head is None:
        print("bench: every treecode leg failed; no headline to report",
              file=sys.stderr)
        sys.exit(1)
    head_kind = ("sustained" if head in (sus1m, sus524, sus262, sus65)
                 else "windowed")
    report = {
        "metric": "effective pairwise interactions/sec/chip "
                  f"(treecode {head_kind}, N={head['n']})",
        "value": head["pairs_per_sec"],
        "unit": "pairs/s",
        "vs_baseline": head["pairs_per_sec"] / BASELINE,
        "ms_per_step": head["ms_per_step"],
        "force_err_p99": head.get("force_err_p99"),
        "force_err_median": head.get("force_err_median"),
        "n": head["n"],
        "solver": "treecode",
        "backend": backend,
    }
    for tag, leg in (("1m", tree1m), ("524k", tree524), ("262k", tree),
                     ("65k", tree65), ("20k", tree20),
                     ("sustained_1m", sus1m),
                     ("sustained_524k", sus524), ("sustained_262k", sus262),
                     ("sustained_65k", sus65), ("sustained_20k", sus20)):
        if leg is not None:
            report[f"tree_pairs_per_sec_{tag}"] = leg["pairs_per_sec"]
            report[f"tree_ms_per_step_{tag}"] = leg["ms_per_step"]
            report[f"tree_vs_baseline_{tag}"] = leg["pairs_per_sec"] / BASELINE
            report[f"tree_force_err_p99_{tag}"] = leg.get("force_err_p99")
    if exact20 is not None:
        report["exact_pairs_per_sec_20k"] = exact20["pairs_per_sec"]
        report["exact_ms_per_step_20k"] = exact20["ms_per_step"]
        report["exact_vs_baseline_20k"] = exact20["pairs_per_sec"] / BASELINE
    if exact is not None:
        report["exact_pairs_per_sec_65k"] = exact["pairs_per_sec"]
        report["exact_ms_per_step_65k"] = exact["ms_per_step"]
        report["exact_vs_baseline"] = exact["pairs_per_sec"] / BASELINE
    if ms_render is not None:
        report["ms_per_step_with_render_65k"] = ms_render
    print(json.dumps(report))


if __name__ == "__main__":
    main()
