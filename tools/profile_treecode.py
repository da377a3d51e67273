"""Per-stage treecode timing on the real TPU.

Times each stage of ``treecode_acc_flat`` (acceptance build, panel
gather, near field, far field, VIP sweep) with ``lax.scan``-wrapped
windows (the sandbox relay has a 20-80 ms dispatch floor; only scanned
timing gives real per-step numbers — CLAUDE.md). The carry perturbs the
positions so CSE can't collapse iterations.

Usage: python tools/profile_treecode.py [--n 262144] [--steps 8]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sync(x) -> float:
    return float(np.asarray(x).ravel()[0])


def timed(fn, steps, *args, warmups=2, reps=3):
    """Min wall-time per call of fn(*args) over scanned windows.

    fn's first arg must be the (N, 3) positions; the carry perturbs them
    by a data-dependent tiny amount each iteration to defeat CSE/hoisting.
    """

    @jax.jit
    def run(pos, *rest):
        def body(p, _):
            out = fn(p, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            bump = sum(jnp.sum(l[:1].astype(jnp.float32)) for l in leaves)
            return p + 1e-30 * bump, None

        p, _ = lax.scan(body, pos, length=steps)
        return p

    for _ in range(warmups):
        _sync(run(*args)[0, 0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(run(*args)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / steps


def profile_hier(args, cfg, state, tc):
    """Per-stage timing of the hierarchical (round-3) columnar path:
    build (acceptance lists), level summaries, near kernel, multi-level
    far kernel, VIP sweep — same scanned-window methodology as the flat
    profiler. All large arrays are passed as jit ARGUMENTS (closures
    over big device constants blow up the relay's remote compile)."""
    import functools

    import jax.numpy as jnp

    n = state.n
    tile, src = cfg.tree_tile, cfg.tree_src_tile
    c2 = cfg.compensate * cfg.compensate
    gc3 = cfg.G * c2 * cfg.compensate
    pos, mass = state.pos, state.mass
    xc, yc, zc = pos[:, 0], pos[:, 1], pos[:, 2]

    if not (cfg.tree_flat_cap > 0 and cfg.tree_far_cap > 0):
        # Off-TPU, Simulation's auto-capacity path doesn't engage (the
        # flat/hier work lists are a TPU production path); size them
        # here so the profiler runs anywhere.
        caps = tc.suggest_hier(
            pos, mass, tile=tile, src_tile=src, theta=cfg.tree_theta,
            vip_tiles=cfg.tree_vip_tiles, slack=cfg.tree_near_slack,
            mac_tau=cfg.tree_hier_tau, mac_tau0=cfg.tree_mac_tau,
            union_coarse=cfg.tree_hier_union,
            eps2=cfg.eps2, compensate=cfg.compensate)
        cfg = cfg.replace(
            **{f: caps[k] for f, k in (("tree_max_near", "max_near"),
                                       ("tree_flat_cap", "flat_cap"),
                                       ("tree_far_max", "far_max"),
                                       ("tree_far_cap", "far_cap"))
               if getattr(cfg, f) == 0})

    hsel = dict(tile=tile, src_tile=src, theta=cfg.tree_theta,
                max_near=cfg.tree_max_near, vip_tiles=cfg.tree_vip_tiles)
    build_kw = dict(slack=cfg.tree_near_slack, flat_cap=cfg.tree_flat_cap,
                    far_max=cfg.tree_far_max, far_cap=cfg.tree_far_cap,
                    mac_tau=cfg.tree_hier_tau, mac_tau0=cfg.tree_mac_tau,
                    union_coarse=cfg.tree_hier_union,
                    eps2=cfg.eps2, compensate=cfg.compensate, **hsel)
    acc_kw = dict(eps2=cfg.eps2, compensate=cfg.compensate, G=cfg.G,
                  far_max=cfg.tree_far_max, **hsel)

    (k_t, k_s, _, _, vip_src, plan, k_total, far_max) = tc._hier_static(
        n, tile, src, cfg.tree_theta, cfg.tree_max_near,
        cfg.tree_vip_tiles, cfg.tree_far_max, tc.HIER_BRANCH)
    print(f"hier: k_t={k_t} k_s={k_s} k_total={k_total} levels={len(plan)} "
          f"far_max={far_max} far_cap={cfg.tree_far_cap} "
          f"flat_cap={cfg.tree_flat_cap}")

    aux = jax.jit(functools.partial(tc.build_tree_hier_cols, **build_kw))(
        xc, yc, zc, mass)
    flat_src, chunk_tgt, far_src, far_tgt, is_vip_body = (
        jax.block_until_ready(aux))
    used = int(np.asarray((far_tgt != k_t).sum())) * tc.FAR_ENTRIES
    print(f"hier: far chunks used {int(np.asarray((far_tgt != k_t).sum()))}"
          f"/{far_tgt.shape[0]} (~{used / max(k_t, 1):.0f} node-entries/row)")

    if vip_src:
        mass_tree = jnp.where(is_vip_body, 0.0, mass)
        vip_tile_idx = np.nonzero(
            np.asarray(is_vip_body).reshape(k_s, src)[:, 0])[0]
        vip_body_idx = (vip_tile_idx[:, None] * src
                        + np.arange(src)[None, :]).reshape(-1)
    else:
        mass_tree = mass
        vip_body_idx = np.arange(0)
    scaled_tree = mass_tree * np.float32(gc3)
    scaled_all = mass * np.float32(gc3)
    tiles = jnp.stack(
        [xc.reshape(k_s, src), yc.reshape(k_s, src),
         zc.reshape(k_s, src), scaled_tree.reshape(k_s, src)], axis=1)
    tiles = jnp.concatenate([tiles, jnp.zeros((1, 4, src), jnp.float32)], 0)
    levels = jax.jit(functools.partial(
        tc._level_summaries, src_tile=src, plan=plan,
        branch=tc.HIER_BRANCH))(xc, yc, zc, mass_tree)
    summ = jax.block_until_ready(tc._summary_panel(levels))

    interp = jax.default_backend() != "tpu"
    r = {}
    r["floor"] = timed(lambda p: p * 1.0000001, args.steps, pos)
    r["total_hier"] = timed(
        lambda p, m, *a: tc.treecode_acc_hier_cols(
            p[:, 0], p[:, 1], p[:, 2], m, a, **acc_kw),
        args.steps, pos, mass, *aux)
    r["build_hier"] = timed(
        lambda p, m: tc.build_tree_hier_cols(
            p[:, 0], p[:, 1], p[:, 2], m, **build_kw),
        args.steps, pos, mass)
    r["summaries"] = timed(
        lambda p, m: tc._summary_panel(tc._level_summaries(
            p[:, 0], p[:, 1], p[:, 2], m, src, plan, tc.HIER_BRANCH)),
        args.steps, pos, mass_tree)
    r["near"] = timed(
        lambda p, t, fs, ct: tc._near_field_flat_cols(
            p[:, 0], p[:, 1], p[:, 2], t, fs, ct, eps2=cfg.eps2, c2=c2,
            tile=tile, src_tile=src, interpret=interp),
        args.steps, pos, tiles, flat_src, chunk_tgt)
    r["far_hier"] = timed(
        lambda p, s, fs, ft: tc._far_field_hier_cols(
            p[:, 0], p[:, 1], p[:, 2], s, fs, ft, eps2=cfg.eps2, c2=c2,
            G=cfg.G, tile=tile, interpret=interp),
        args.steps, pos, summ, far_src, far_tgt)
    if vip_src:
        r["vip"] = timed(
            lambda p, sa, px, py, pz, sv: tc._vip_both_pallas_cols(
                p[:, 0], p[:, 1], p[:, 2], sa, px, py, pz, sv,
                eps2=cfg.eps2, c2=c2, interpret=interp),
            args.steps, pos, scaled_all, xc[vip_body_idx],
            yc[vip_body_idx], zc[vip_body_idx], scaled_all[vip_body_idx])

    rebuild = cfg.tree_rebuild_every
    floor = r["floor"]
    print(f"\n--- per call (ms, floor-corrected); build amortizes over "
          f"{rebuild} steps ---")
    for name, dt in r.items():
        print(f"{name:12s} {dt * 1e3:9.2f}   ({(dt - floor) * 1e3:8.2f})")
    stage_names = [s for s in ("near", "far_hier", "summaries", "vip")
                   if s in r]
    stages = sum(r[s] - floor for s in stage_names)
    print(f"{'sum stages':12s} {stages * 1e3:9.2f}  (+ build/{rebuild} = "
          f"{(stages + (r['build_hier'] - floor) / rebuild) * 1e3:.2f})")
    eff = args.n * (args.n - 1)
    tot = r["total_hier"] - floor
    print(f"effective pairs/s at total_hier-floor: {eff / tot:.3e} "
          f"({eff / r['total_hier']:.3e} raw)")

    if args.err:
        from n_body_problem_tpu.ops.forces import pair_accel_tile

        sub = np.arange(0, n, max(n // 2048, 1))
        ax, ay, az = tc.treecode_acc_hier_cols(xc, yc, zc, mass, aux,
                                               **acc_kw)
        approx = np.stack([np.asarray(ax)[sub], np.asarray(ay)[sub],
                           np.asarray(az)[sub]], axis=1)
        rows = min(512, max(64, int(1.5e9 // (12 * n))))
        exact = np.concatenate([
            np.asarray(pair_accel_tile(
                state.pos[sub[a:a + rows]], state.pos, mass,
                eps2=cfg.eps2, compensate=cfg.compensate, G=cfg.G))
            for a in range(0, len(sub), rows)
        ])
        e = (np.linalg.norm(approx - exact, axis=1)
             / np.maximum(np.linalg.norm(exact, axis=1), 1e-12))
        print(f"force err: median {np.median(e):.2e} "
              f"p99 {np.percentile(e, 99):.2e} max {e.max():.2e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--src", type=int, default=0, help="tree_src_tile")
    ap.add_argument("--theta", type=float, default=0.0)
    ap.add_argument("--tau", type=float, default=-1.0,
                    help="tree_mac_tau override (-1 keeps default)")
    ap.add_argument("--vip", type=int, default=-1)
    ap.add_argument("--slack", type=int, default=-1)
    ap.add_argument("--err", action="store_true",
                    help="probe force error vs exact oracle")
    ap.add_argument("--hier", action="store_true",
                    help="profile the hierarchical (round-3) path stages")
    args = ap.parse_args()

    from n_body_problem_tpu import SimConfig, Simulation, models
    from n_body_problem_tpu.ops import treecode as tc

    over = {"tree_hier": bool(args.hier)}
    if args.src:
        over["tree_src_tile"] = args.src
    if args.theta:
        over["tree_theta"] = args.theta
    if args.tau >= 0:
        over["tree_mac_tau"] = args.tau
    if args.vip >= 0:
        over["tree_vip_tiles"] = args.vip
    if args.slack >= 0:
        over["tree_near_slack"] = args.slack
    cfg = SimConfig(solver="treecode", **over)
    sim = Simulation(cfg, models.plummer(args.n, seed=0))
    cfg = sim.cfg
    state = sim.state
    n = state.n
    tile = cfg.tree_tile
    print(f"n={n} tile={tile} theta={cfg.tree_theta} tau={cfg.tree_mac_tau} "
          f"max_near={cfg.tree_max_near} flat_cap={cfg.tree_flat_cap} "
          f"vip={cfg.tree_vip_tiles}")

    src = cfg.tree_src_tile
    sel = dict(tile=tile, src_tile=src, theta=cfg.tree_theta,
               max_near=cfg.tree_max_near, vip_tiles=cfg.tree_vip_tiles)
    bsel = dict(mac_tau=cfg.tree_mac_tau, eps2=cfg.eps2,
                compensate=cfg.compensate, **sel)
    kw = dict(eps2=cfg.eps2, compensate=cfg.compensate, G=cfg.G, **sel)
    pos, mass = state.pos, state.mass
    c2 = cfg.compensate * cfg.compensate
    gc3 = cfg.G * c2 * cfg.compensate

    if args.hier:
        profile_hier(args, cfg, state, tc)
        return

    aux = jax.jit(functools.partial(
        tc.build_tree_flat, slack=cfg.tree_near_slack,
        flat_cap=cfg.tree_flat_cap, **bsel,
    ))(pos, mass)
    flat_src, chunk_tgt, near_mask, is_vip_body = jax.block_until_ready(aux)
    k_s = n // src
    vip_src = tc._clamp_vip(
        tc._vip_src_tiles(cfg.tree_vip_tiles, tile, src), k_s)
    vip_tile_idx = np.nonzero(
        np.asarray(is_vip_body).reshape(k_s, src)[:, 0])[0]
    vip_body_idx = (vip_tile_idx[:, None] * src
                    + np.arange(src)[None, :]).reshape(-1)
    mass_tree = jnp.where(is_vip_body, 0.0, mass)
    com, m_tot, _, quad = tc.tile_summaries(pos, mass_tree, src)
    scaled_tree = mass_tree * np.float32(gc3)
    scaled_all = mass * np.float32(gc3)
    tiles = jnp.stack(
        [pos[:, 0].reshape(k_s, src), pos[:, 1].reshape(k_s, src),
         pos[:, 2].reshape(k_s, src), scaled_tree.reshape(k_s, src)], axis=1)
    tiles = jnp.concatenate([tiles, jnp.zeros((1, 4, src), jnp.float32)], 0)
    tiles = jax.block_until_ready(tiles)

    r = {}

    # Dispatch-floor probe: a near-free stage. Every window pays the
    # relay's fixed dispatch cost once; floor/steps rides on every number.
    r["floor"] = timed(lambda p: p * 1.0000001, args.steps, pos)

    r["total_flat"] = timed(
        lambda p, m, a: tc.treecode_acc_flat(p, m, a, **kw),
        args.steps, pos, mass, aux)

    r["build_flat"] = timed(
        lambda p, m: tc.build_tree_flat(
            p, m, slack=cfg.tree_near_slack, flat_cap=cfg.tree_flat_cap,
            **bsel),
        args.steps, pos, mass)

    r["near"] = timed(
        lambda p, t, fs, ct: tc._near_field_flat(
            p, t, fs, ct, eps2=cfg.eps2, c2=c2, tile=tile, src_tile=src,
            interpret=False),
        args.steps, pos, tiles, flat_src, chunk_tgt)

    r["far"] = timed(
        lambda p, cm, mt, q, msk: tc._far_field_pallas(
            p, cm, mt, q, msk, eps2=cfg.eps2, c2=c2, G=cfg.G, tile=tile,
            interpret=False),
        args.steps, pos, com, m_tot, quad, near_mask)

    r["vip"] = timed(
        lambda p, sa, pv, sv: tc._vip_both_pallas(
            p, sa, pv, sv, eps2=cfg.eps2, c2=c2, interpret=False),
        args.steps, pos, scaled_all,
        pos[vip_body_idx], scaled_all[vip_body_idx])

    # summaries (cheap, but confirm)
    r["summaries"] = timed(
        lambda p, m: tc.tile_summaries(p, m, src),
        args.steps, pos, mass_tree)

    rebuild = cfg.tree_rebuild_every
    floor = r["floor"]
    print(f"\n--- per call (ms, floor-corrected); build amortizes over "
          f"{rebuild} steps ---")
    for name, dt in r.items():
        print(f"{name:12s} {dt * 1e3:9.2f}   ({(dt - floor) * 1e3:8.2f})")
    stages = (r["near"] + r["far"] + r["vip"] + r["summaries"]
              - 4 * floor)
    amort = stages + r["build_flat"] - floor
    print(f"{'sum stages':12s} {stages * 1e3:9.2f}  (+ build/{rebuild} = "
          f"{(stages + (r['build_flat'] - floor) / rebuild) * 1e3:.2f})")
    eff = args.n * (args.n - 1)
    tot = r["total_flat"] - floor
    print(f"effective pairs/s at total_flat-floor: {eff / tot:.3e} "
          f"({eff / r['total_flat']:.3e} raw)")

    if args.err:
        from n_body_problem_tpu.ops.forces import pair_accel_tile

        sub = np.arange(0, n, max(n // 2048, 1))
        approx = np.asarray(tc.treecode_acc_flat(pos, mass, aux, **kw))[sub]
        exact = np.concatenate([
            np.asarray(pair_accel_tile(
                pos[sub[a:a + 512]], pos, mass, eps2=cfg.eps2,
                compensate=cfg.compensate, G=cfg.G))
            for a in range(0, len(sub), 512)
        ])
        e = (np.linalg.norm(approx - exact, axis=1)
             / np.maximum(np.linalg.norm(exact, axis=1), 1e-12))
        print(f"force err: median {np.median(e):.2e} "
              f"p99 {np.percentile(e, 99):.2e} max {e.max():.2e}")


if __name__ == "__main__":
    main()
