"""Staged source streaming: the capacity-scaling path past replication.

The production multi-chip treecode (``parallel/tree.py``) REPLICATES
sources: every force evaluation ``all_gather``s the global position
columns (12N bytes resident per chip) and rebuilds the (K_s+1, 4, S)
source panel from them (16N bytes) — throughput scales 1/D but the
per-chip footprint stays O(N), capping N at one chip's HBM
(docs/design.md "Capacity ceiling" quantifies it at ~1e8 bodies on a
16-GiB chip, rebuild transients included).

This module prototypes the decomposition that lifts the ceiling for the
FORCE evaluation: only the per-source-tile SUMMARIES are replicated
(~44 B per ``src_tile`` bodies — 64x lighter than positions at
src_tile=64 before lane padding), and the source PANELS stream
ring-wise: D stages, each ``ppermute``-ing one (N/D)-body shard around
the ring while every chip evaluates the near-field entries whose source
tiles live in the visiting shard. Peak resident source data drops from
O(N) to O(N/D) + summaries; total ICI bytes are unchanged (the gather
moved the same shards, all at once). The acceptance lists compact
PER SOURCE SHARD at build time — same scores, same criterion, bucketed
by which ring stage can serve them.

Equality with the replicated path is by construction (same opening
scores ⇒ same near set, modulo the per-shard vs global top-k rounding
of the slack entries — an exact-near-work difference inside the force
error envelope; ``tests/test_stream.py`` pins both the exact-limit
bitwise case and the production-tau tolerance case).

Prototype scope (CPU-mesh validated; promote when a real pod exists):
flat (single-level) far field from the replicated summaries, no VIP
split (``tree_vip_tiles == 0``), force evaluation only — the
integrator/resort loop around it is ``parallel/tree.py``'s unchanged.

Reference: the ring rotation is kernel.cu's shared-memory tile stream
(``kernel.cu:840-860``) lifted across chips, exactly like
``parallel/ring.py`` for the exact solvers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from n_body_problem_tpu.config import SimConfig
from n_body_problem_tpu.ops.treecode import (
    CHUNK_LANES,
    _compact_open_lists,
    _far_field_pallas_cols,
    _near_field_flat_cols,
    _opening_scores,
    tile_summaries_cols,
)
from n_body_problem_tpu.parallel.ring import RING_AXIS


def make_staged_flat_force(cfg: SimConfig, mesh: Mesh,
                           axis_name: str = RING_AXIS) -> Callable:
    """``(pos (N,3) sharded, mass (N,) sharded) -> acc (N,3) sharded`` —
    one flat-treecode force evaluation with ring-streamed source panels.

    Requires ``cfg.tree_vip_tiles == 0`` (prototype scope) and explicit
    ``tree_tile``/``tree_src_tile``/``tree_max_near``. ``tree_flat_cap``
    is the PER-STAGE per-chip capacity (sized like the replicated path's
    cap divided by D, plus slack margin).
    """
    if cfg.tree_vip_tiles != 0:
        raise ValueError("staged streaming prototype: tree_vip_tiles must "
                         "be 0 (the VIP panel is a gathered global set)")
    tile = cfg.tree_tile or 32
    src = cfg.tree_src_tile
    n_dev = mesh.devices.size
    entries = CHUNK_LANES // src
    c2 = cfg.compensate * cfg.compensate
    gc3 = cfg.G * c2 * cfg.compensate
    interpret = jax.default_backend() != "tpu"

    def local(xl, yl, zl, ml):
        me = lax.axis_index(axis_name)
        n_l = xl.shape[0]
        k_t_l = n_l // tile
        k_s_l = n_l // src
        if k_s_l < entries:
            # Mirror _flat_src_static's guard at the per-shard count:
            # with fewer source tiles than chunk entries, max_near clamps
            # below one chunk and _compact_open_lists emits ZERO chunks
            # per row — the near field (including the forced-open self
            # tile) would silently fall into the far field as a
            # self-multipole at d~0. Fail loudly instead.
            raise ValueError(
                f"staged streaming needs per-shard K_src >= entries: "
                f"N/D={n_l} gives {k_s_l} source tiles of {src} < "
                f"{entries} chunk entries (CHUNK_LANES={CHUNK_LANES}); "
                f"use fewer devices, more bodies, or a larger src_tile")
        f32 = jnp.float32
        xl, yl, zl, ml = (a.astype(f32) for a in (xl, yl, zl, ml))

        # Per-shard static capacities, mirroring _flat_src_static but on
        # the shard's source count.
        max_near = max(-(-cfg.tree_max_near // entries) * entries, entries)
        max_near = min(max_near, k_s_l - (k_s_l % entries) or k_s_l)
        cap = max(cfg.tree_flat_cap, k_t_l * entries)
        cap = -(-cap // entries) * entries

        # ---- replicated SUMMARIES only (44 B per src tile, vs 12N bytes
        # of positions on the replicated path).
        com_l, m_tot_l, radius_l, quad_l = tile_summaries_cols(
            xl, yl, zl, ml, src)
        gather = lambda a: lax.all_gather(a, axis_name, tiled=True)
        com_g = gather(com_l)                       # (K_s_g, 3)
        m_tot_g = gather(m_tot_l)
        radius_g = gather(radius_l)
        quad_g = gather(quad_l)

        # ---- acceptance: identical scores to the replicated build
        # (same summaries, same local rows, same row_offset), compacted
        # PER SOURCE SHARD so each ring stage has a ready work list.
        score, thresh = _opening_scores(
            xl, yl, zl, com_g, radius_g, m_tot_g, tile,
            theta=cfg.tree_theta, mac_tau=cfg.tree_mac_tau,
            row_offset=me * k_t_l, src_tile=src, eps2=cfg.eps2, c2=c2,
        )
        lists = [
            _compact_open_lists(
                lax.dynamic_slice_in_dim(score, d * k_s_l, k_s_l, axis=1),
                thresh, cfg.tree_near_slack, cap, entries, max_near)
            for d in range(n_dev)
        ]
        flat_src_all = jnp.stack([l[0] for l in lists])     # (D, cap)
        chunk_tgt_all = jnp.stack([l[1] for l in lists])    # (D, cap/E)
        near_mask = jnp.concatenate([l[2] for l in lists], axis=1)

        # The per-shard slices used a LOCAL self-overlap offset only via
        # the global score matrix, so the forced-open self tile already
        # sits in shard me's list. Rotate the list stack so index s picks
        # the shard VISITING at stage s: after s ppermute hops the chip
        # holds shard (me - s) mod D.
        stage_ids = (me - jnp.arange(n_dev, dtype=jnp.int32)) % n_dev

        # ---- ring-staged near field
        payload0 = jnp.stack(
            [xl.reshape(k_s_l, src), yl.reshape(k_s_l, src),
             zl.reshape(k_s_l, src), (ml * f32(gc3)).reshape(k_s_l, src)],
            axis=1,
        )                                                   # (k_s_l, 4, S)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def stage(carry, s):
            payload, accn = carry
            sid = stage_ids[s]
            fs = jnp.take(flat_src_all, sid, axis=0)
            ct = jnp.take(chunk_tgt_all, sid, axis=0)
            tiles = jnp.concatenate(
                [payload, jnp.zeros((1, 4, src), f32)], axis=0)
            accn = accn + _near_field_flat_cols(
                xl, yl, zl, tiles, fs, ct, eps2=cfg.eps2, c2=c2,
                tile=tile, src_tile=src, interpret=interpret)
            payload = lax.ppermute(payload, axis_name, perm)
            return (payload, accn), None

        accn0 = jnp.zeros(((k_t_l + 1) * tile, 8), f32)
        (_, accn), _ = lax.scan(stage, (payload0, accn0),
                                jnp.arange(n_dev, dtype=jnp.int32))

        # ---- far field from the replicated summaries (flat single-level)
        accf = _far_field_pallas_cols(
            xl, yl, zl, com_g, m_tot_g, quad_g, near_mask,
            eps2=cfg.eps2, c2=c2, G=cfg.G, tile=tile, interpret=interpret)
        ax = accn[:n_l, 0] + accf[:n_l, 0]
        ay = accn[:n_l, 1] + accf[:n_l, 1]
        az = accn[:n_l, 2] + accf[:n_l, 2]
        return ax, ay, az

    row = P(axis_name)
    sharded = jax.shard_map(local, mesh=mesh, in_specs=(row,) * 4,
                            out_specs=(row,) * 3, check_vma=False)

    def force(pos: jax.Array, mass: jax.Array) -> jax.Array:
        ax, ay, az = sharded(pos[:, 0], pos[:, 1], pos[:, 2], mass)
        return jnp.stack([ax, ay, az], axis=1)

    return force
