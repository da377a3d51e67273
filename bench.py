"""Flagship benchmark: effective pairwise interactions/sec on one chip.

Default (no args) runs the HEADLINE suite — four sustained treecode
legs:

1. N=524,288 and 2. N=1,048,576 (the single-chip flagship scales —
   ordered FIRST so their keys land in a driver-truncated record),
3. N=20,480 tuned (the reference's own workload; its 1.6 ms/step on the
   4090, ``kernel.cu:73``, is the only number it ever published —
   driver-captured at 1.04x in ``BENCH_r04.json``),
4. N=65,536 (the reference-comparable scale).

Each leg runs hundreds of steps through ``run()`` (every rebuild,
resort and capacity effect inside the timed window, compile excluded by
a same-length warmup) and measures its force-error envelope in the same
run against an exact oracle on 2,048 sampled bodies of the post-warmup
state (fixed probe depth), so every effective-throughput claim carries
its accuracy alongside (~1e-3 p99 relative force error at the default
tau).

Output protocol (round-5, VERDICT r4 #1): two phases. Phase 1 runs ONLY
the four timings, re-printing the full cumulative report as one JSON
line (``flush=True``) after EVERY leg — the flagship 524k/1M keys land
before any probe budget is spent. Phase 2 replays the deferred error
probes (cheapest first), re-flushing after each. The last JSON line on
stdout is therefore always the most complete record — a driver timeout
mid-suite costs at worst the remaining probes' error fields, never a
finished timing (round 4 lost a finished 65k timing to a probe-time
kill; round 3 lost everything to a print-once-at-the-end layout).
``legs_done``/``legs_total`` mark partial snapshots.

``--full`` appends the secondary legs (windowed variants, N=262,144,
the 24k/32k crossover-bracket legs, the exact ``pallas_symmetric``
brute-force legs, step+render). ``vs_baseline`` compares the headline
(the sustained rate of the largest completed treecode leg) to the
reference's derived RTX 4090 throughput of 2.6e11 directed
interactions/s (BASELINE.md). With ``--n``/``--solver``, benchmarks
that single configuration instead (same JSON schema, one line).
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


def time_config(n: int, solver: str, steps: int, warmup: int = 1,
                probe_error: bool | None = None, windows: int = 3,
                chunks: int = 1, **cfg_kw):
    """Time one configuration; returns ``(record, probe_fn)``.

    ``record`` carries the timing; ``probe_fn`` (or ``None``) is a
    deferred closure that runs the exact-oracle error probe and mutates
    ``record`` in place with the ``force_err_*`` fields. The split
    exists so the suite can FLUSH a finished timing before spending the
    probe's ~2 remote compiles on it — round 4 lost a finished 65k
    timing (9.844 ms/step, visible in the captured stderr tail) because
    the driver kill arrived during its probe (VERDICT r4 #1).

    Extra kwargs are SimConfig overrides (used by tools/tune_small_n.py
    for the small-N sweep).

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

    # Snapshot the post-warmup state for the error probe BEFORE the timed
    # windows evolve it further. Probe depth must be a fixed function of
    # the leg (warmup * steps), not of how many timed windows follow:
    # force error grows as the Plummer core collapses (measured at
    # N=20,480, tau 5e-4: p99 1.15e-3 after ~1k steps vs 4.7e-3 after
    # ~2.5k — bit-identical across code versions, i.e. a protocol effect,
    # bisected 2026-08-19), so probing the final state made the reported
    # envelope depend on window count and broke cross-round comparisons.
    # Host copies: with cfg.donate the timed windows donate (delete) the
    # snapshot's device buffers (regression: two "Array has been deleted"
    # rows in tune_small_n_20260819.jsonl came from probing the live
    # state after donation — the probe must consume these host copies).
    probe_pos = np.asarray(sim.state.pos)
    probe_mass = np.asarray(sim.state.mass)
    rcfg = sim.cfg  # resolved config (auto caps filled in)

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
    if not probe_error:
        return out, None

    def probe() -> dict:
        # Accuracy rides along with every effective-throughput claim:
        # exact oracle on sampled bodies of the post-warmup state (fixed
        # probe depth = warmup * steps; see the snapshot note above).
        # 2,048 stride-sampled bodies bound p99 well even for a 524k
        # population: the empirical 99th percentile of m samples has
        # quantile-rank s.e. sqrt(.01*.99/m) ~ 0.22%, i.e. the estimate
        # sits between the true p98.3 and p99.7 (95% CI) regardless of
        # N; stride sampling over the Morton-sorted order is a spatial
        # stratified sample (core and halo covered proportionally), so
        # there is no locality bias for the percentile to hide in.
        from n_body_problem_tpu.ops.forces import pair_accel_tile
        from n_body_problem_tpu.ops.registry import make_force_fn

        import jax.numpy as jnp

        n_pad = probe_pos.shape[0]
        out["probe_depth_steps"] = steps * max(warmup, 1)
        sub = np.arange(0, n_pad, max(n_pad // 2048, 1))
        force_fn = make_force_fn(rcfg, n=n_pad)
        # Fresh device copies per consumer: force_fn may donate its args.
        approx = np.asarray(force_fn(jnp.asarray(probe_pos),
                                     jnp.asarray(probe_mass)))[sub]
        # Chunk the oracle rows: pair_accel_tile materializes (I, N, 3),
        # which OOMs past N ~ 300k at I = 2048. Budget ~1.5 GB of
        # transient per chunk (I*N*12 bytes) so the probe survives N=1M.
        rows = min(512, max(64, int(1.5e9 // (12 * n_pad))))
        dev_pos, dev_mass = jnp.asarray(probe_pos), jnp.asarray(probe_mass)
        exact = np.concatenate([
            np.asarray(pair_accel_tile(
                dev_pos[sub[a:a + rows]], dev_pos, dev_mass,
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

    return out, probe


def bench_config(n: int, solver: str, steps: int, warmup: int = 1,
                 probe_error: bool | None = None, windows: int = 3,
                 chunks: int = 1, **cfg_kw) -> dict:
    """Time one configuration and run its error probe immediately
    (single-config mode and tools/tune_small_n.py use this; the suite
    uses :func:`time_config` to defer probes past the timing flushes)."""
    out, probe = time_config(n, solver, steps, warmup=warmup,
                             probe_error=probe_error, windows=windows,
                             chunks=chunks, **cfg_kw)
    if probe is not None:
        probe()
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
    ap.add_argument("--full", action="store_true",
                    help="append the secondary legs (windowed variants, "
                         "262k, 24k/32k bracket, exact brute-force, "
                         "render) after the headline suite")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()

    if args.n or args.solver:
        run_single(args.n, args.solver, args.steps, chunks=args.chunks,
                   windows=args.windows)
        return

    # ---- flagship suite ----
    # Every leg is individually fault-tolerant (the relay occasionally
    # wedges at the largest sizes), runs SUSTAINED windows (hundreds of
    # steps through run(): every rebuild, resort and capacity-drift
    # effect inside the timed window, compile excluded by a same-length
    # warmup; a >=128-step window self-averages the relay's ~20-90 ms
    # dispatch jitter so one timed window suffices), and is chunked into
    # <= ~25 s device programs (the relay kills programs much past
    # ~60 s — see time_config).
    #
    # Budget shape (VERDICT r4 #1): the driver kill arrives mid-suite,
    # so the suite is two phases. Phase 1 runs ONLY the timings — the
    # 524k/1M flagship legs FIRST (the round-5 bar; the 20k vs-4090
    # headline is already driver-captured in BENCH_r04.json), then
    # 20k/65k — flushing the cumulative JSON after each, so the
    # flagship keys land before any probe budget is spent.
    # Phase 2 replays the deferred error probes (cheapest first) and
    # re-flushes after each; a kill during phase 2 costs only error
    # fields, never a timing. Per-leg cost is ~2 remote compiles in
    # phase 1 (run scan; the probe's force_fn + oracle are phase 2).
    if args.steps:
        print("bench: --steps is ignored in suite mode (leg step counts "
              "are fixed); use --n for single-config mode", file=sys.stderr)
    from n_body_problem_tpu.config import tuned_tree_overrides

    legs: list[tuple[str, dict]] = [
        # FLAGSHIP LEGS FIRST (VERDICT r4 #1: the bar is the 524k/1M keys
        # landing in the driver-captured record; the 20k headline is
        # already driver-captured in BENCH_r04.json). 128 timed steps at
        # ~260 ms/step = ~33 s, one chunk; 16 rebuild cadences inside
        # the window, enough to self-average the relay jitter.
        ("sustained_524k", dict(n=524288, solver="treecode", steps=128,
                                chunks=1, windows=1)),
        # 48-step chunks at 1M: ~470 ms/step means 64-step chunks
        # (~30 s) graze the relay's ~60 s program kill; 48 (~23 s) is
        # the measured-safe size (2026-08-18: 467.9 ms/step sustained).
        ("sustained_1m", dict(n=1048576, solver="treecode", steps=48,
                              chunks=2, windows=1)),
        # The reference's own workload (kernel.cu:73: 1.6 ms/step on the
        # 4090 at N=20,225 = padded 20,480 — the only number it ever
        # published), with the measured small-N tuned config
        # (config.tuned_tree_overrides, tools/tune_small_n.py sweep).
        # One 1024-step chunk (~1.6 s device program, far under the
        # relay's ~60 s kill): halving the per-window dispatch count
        # halves the ~28 ms relay floor's share (~0.03 ms/step at this
        # leg's 1.6 ms steps).
        ("sustained_20k", dict(n=20480, solver="treecode", steps=1024,
                               chunks=1, windows=1,
                               **tuned_tree_overrides(20480))),
        ("sustained_65k", dict(n=65536, solver="treecode", steps=512,
                               chunks=1, windows=1)),
    ]
    if args.full:
        legs += [
            ("sustained_262k", dict(n=262144, solver="treecode", steps=256,
                                    chunks=2, windows=1)),
            # Windowed variants: short 256-step windows pay
            # proportionally more rebuild/dispatch overhead than the
            # sustained legs (measured 0.88x vs 1.04x at 20k, r4) —
            # secondary evidence, not headline material.
            ("20k", dict(n=20480, solver="treecode", steps=256, windows=2,
                         **tuned_tree_overrides(20480))),
            ("524k", dict(n=524288, solver="treecode", steps=32)),
            ("262k", dict(n=262144, solver="treecode", steps=32)),
            ("65k", dict(n=65536, solver="treecode", steps=128)),
            ("1m", dict(n=1048576, solver="treecode", steps=16)),
            # Crossover-bracket legs (BASELINE.md): tuned configs at the
            # first sizes past the reference's own workload, matched
            # error class (default tau; the r4 sweep measured 1.044x at
            # 24,576 / p99 6.5e-4 and 1.28x at 32,768).
            ("24k", dict(n=24576, solver="treecode", steps=256,
                         **tuned_tree_overrides(24576))),
            ("32k", dict(n=32768, solver="treecode", steps=256,
                         **tuned_tree_overrides(32768))),
        ]

    done: dict[str, dict] = {}

    def snapshot(total: int, exact20=None, exact65=None, ms_render=None):
        """Cumulative report over completed legs; printed after EVERY leg
        so a timeout can never zero the record (VERDICT r3 #1)."""
        # Largest sustained leg first; the 20k legs are the fallback
        # headline only when nothing bigger has completed yet (they are
        # ordered first in the suite, so early snapshots need them).
        order = ("sustained_1m", "sustained_524k", "sustained_262k",
                 "sustained_65k", "1m", "524k", "262k", "65k",
                 "sustained_20k", "20k", "24k", "32k")
        head_tag = next((t for t in order if t in done), None)
        if head_tag is None:
            return
        head = done[head_tag]
        kind = "sustained" if head_tag.startswith("sustained") else "windowed"
        report = {
            "metric": "effective pairwise interactions/sec/chip "
                      f"(treecode {kind}, N={head['n']})",
            "value": head["pairs_per_sec"],
            "unit": "pairs/s",
            "vs_baseline": head["pairs_per_sec"] / BASELINE,
            "ms_per_step": head["ms_per_step"],
            "force_err_p99": head.get("force_err_p99"),
            "force_err_median": head.get("force_err_median"),
            "n": head["n"],
            "solver": "treecode",
            "backend": backend,
            "legs_done": len(done),
            "legs_total": total,
        }
        for tag, leg in done.items():
            report[f"tree_pairs_per_sec_{tag}"] = leg["pairs_per_sec"]
            report[f"tree_ms_per_step_{tag}"] = leg["ms_per_step"]
            report[f"tree_vs_baseline_{tag}"] = leg["pairs_per_sec"] / BASELINE
            report[f"tree_force_err_p99_{tag}"] = leg.get("force_err_p99")
        if exact20 is not None:
            report["exact_pairs_per_sec_20k"] = exact20["pairs_per_sec"]
            report["exact_ms_per_step_20k"] = exact20["ms_per_step"]
            report["exact_vs_baseline_20k"] = exact20["pairs_per_sec"] / BASELINE
        if exact65 is not None:
            report["exact_pairs_per_sec_65k"] = exact65["pairs_per_sec"]
            report["exact_ms_per_step_65k"] = exact65["ms_per_step"]
            report["exact_vs_baseline"] = exact65["pairs_per_sec"] / BASELINE
        if ms_render is not None:
            report["ms_per_step_with_render_65k"] = ms_render
        print(json.dumps(report), flush=True)
        return report

    def safe(fn, *a, **kw):
        try:
            return fn(*a, **kw)
        except Exception as e:  # pragma: no cover - relay-dependent
            print(f"bench: leg failed: {e!r}", file=sys.stderr)
            return None

    # Phase 1: timings only, flushing after each leg.
    total = len(legs)
    probes: list[tuple[int, callable]] = []
    for tag, kw in legs:
        r = safe(time_config, **kw)
        if r is not None:
            rec, probe = r
            done[tag] = rec
            if probe is not None:
                probes.append((kw["n"], probe))
            snapshot(total)

    # Phase 2: deferred error probes, cheapest first (each is ~2 remote
    # compiles; a kill here costs only force_err_* fields). The probe
    # mutates its leg's record in place, so re-snapshotting publishes it.
    for _, probe in sorted(probes, key=lambda p: p[0]):
        if safe(probe) is not None:
            snapshot(total)

    exact20 = exact65 = ms_render = None
    if args.full:
        exact20 = safe(bench_config, 20480, "pallas_symmetric", steps=64)
        exact65 = safe(bench_config, 65536, "pallas_symmetric", steps=16)
        ms_render = safe(bench_render, 65536, "pallas_symmetric")

    if not done:
        print("bench: every treecode leg failed; no headline to report",
              file=sys.stderr)
        sys.exit(1)
    snapshot(total, exact20, exact65, ms_render)


if __name__ == "__main__":
    main()
