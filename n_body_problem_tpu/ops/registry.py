"""Solver registry: config -> force function.

The reference selects its solver at compile time via ``#define VERSION``
(``kernel.cu:70-73``). Here ``SimConfig.solver`` picks a backend at trace
time; ``"auto"`` resolves to the Pallas kernel on TPU and the MXU matmul
formulation elsewhere (the Pallas kernels also run everywhere via the
interpreter, but only for tests).
"""

from __future__ import annotations

from typing import Callable

import jax

from n_body_problem_tpu.config import SimConfig
from n_body_problem_tpu.ops import forces

ForceFn = Callable[[jax.Array, jax.Array], jax.Array]


# Largest N validated for the whole-problem-VMEM-resident symmetric kernel
# on one v5e (547.7 ms/step at 262,144; see STATUS.md). Above this, `auto`
# falls back to the streamed blocked kernel whose VMEM use is O(tile).
SYMMETRIC_RESIDENT_CAP = 262_144


def resolve_solver(solver: str, backend: str | None = None,
                   n: int | None = None) -> str:
    """Resolve ``"auto"`` to a concrete solver name.

    On TPU the flagship is the symmetric half-pair kernel whenever the body
    count fits its VMEM-resident envelope (or is unknown); beyond the cap it
    falls back to the streamed blocked Pallas kernel. Elsewhere, the MXU
    matmul formulation (the Pallas kernels only interpret off-TPU).
    """
    if solver != "auto":
        return solver
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return "mxu"
    if n is None or n <= SYMMETRIC_RESIDENT_CAP:
        return "pallas_symmetric"
    return "pallas"


def make_force_fn(cfg: SimConfig, backend: str | None = None,
                  n: int | None = None) -> ForceFn:
    """Build ``(pos, mass) -> acc`` for the configured solver.

    All returned functions require N to already satisfy the solver's padding
    (see :func:`n_body_problem_tpu.ops.forces.required_padding` and
    :func:`n_body_problem_tpu.state.pad_state`). ``n`` only informs the
    ``"auto"`` resolution; the returned function stays shape-generic.
    """
    solver = resolve_solver(cfg.solver, backend, n)
    kw = dict(eps2=cfg.eps2, compensate=cfg.compensate, G=cfg.G)

    if solver == "direct":
        return lambda pos, mass: forces.direct_acc(pos, mass, **kw)
    if solver == "blocked":
        return lambda pos, mass: forces.blocked_acc(
            pos, mass, block_size=cfg.block_size, **kw
        )
    if solver == "mxu":
        return lambda pos, mass: forces.mxu_acc(
            pos, mass, block_size=cfg.block_size, **kw
        )
    if solver == "pallas":
        from n_body_problem_tpu.ops import pallas_force

        return lambda pos, mass: pallas_force.pallas_acc(
            pos, mass, tile_i=cfg.pallas_tile_i, tile_j=cfg.pallas_tile_j, **kw
        )
    if solver == "pallas_symmetric":
        from n_body_problem_tpu.ops import pallas_symmetric

        return lambda pos, mass: pallas_symmetric.symmetric_acc(
            pos, mass, tile=cfg.pallas_sym_tile,
            precision=cfg.pallas_sym_precision, **kw
        )
    if solver == "treecode":
        from n_body_problem_tpu.config import resolve_vip_tiles
        from n_body_problem_tpu.ops import treecode

        if cfg.tree_vip_tiles == -1:
            # Simulation resolves the auto sentinel at init; resolve here
            # too for direct make_force_fn callers (n=None falls back to
            # the flagship budget).
            cfg = cfg.replace(tree_vip_tiles=resolve_vip_tiles(
                -1, n if n else 262144))
        max_near = cfg.tree_max_near or treecode.DEFAULT_MAX_NEAR
        tile = cfg.tree_tile or 32
        if cfg.tree_hier and cfg.tree_flat_cap > 0 and cfg.tree_far_cap > 0:
            # Hierarchical production path (multi-level compacted far
            # lists); acceptance built fresh per call — Simulation.run
            # caches it across tree_rebuild_every steps instead.
            hsel = dict(tile=tile, src_tile=cfg.tree_src_tile,
                        theta=cfg.tree_theta, max_near=max_near,
                        vip_tiles=cfg.tree_vip_tiles)

            def hier_force(pos, mass):
                x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
                aux = treecode.build_tree_hier_cols(
                    x, y, z, mass, slack=cfg.tree_near_slack,
                    flat_cap=cfg.tree_flat_cap, far_max=cfg.tree_far_max,
                    far_cap=cfg.tree_far_cap, mac_tau=cfg.tree_hier_tau,
                    mac_tau0=cfg.tree_mac_tau,
                    union_coarse=cfg.tree_hier_union,
                    eps2=cfg.eps2, compensate=cfg.compensate, **hsel)
                ax, ay, az = treecode.treecode_acc_hier_cols(
                    x, y, z, mass, aux, far_max=cfg.tree_far_max,
                    **kw, **hsel)
                import jax.numpy as _jnp

                return _jnp.stack([ax, ay, az], axis=1)

            return hier_force
        if cfg.tree_flat_cap > 0:
            # The flat (asymmetric, mean-bound) production path; builds
            # its acceptance fresh per call — Simulation.run caches it
            # across tree_rebuild_every steps instead.
            sel = dict(tile=tile, src_tile=cfg.tree_src_tile,
                       theta=cfg.tree_theta, max_near=max_near,
                       vip_tiles=cfg.tree_vip_tiles)

            def flat_force(pos, mass):
                aux = treecode.build_tree_flat(
                    pos, mass, slack=cfg.tree_near_slack,
                    flat_cap=cfg.tree_flat_cap,
                    mac_tau=cfg.tree_mac_tau, eps2=cfg.eps2,
                    compensate=cfg.compensate, **sel)
                return treecode.treecode_acc_flat(pos, mass, aux, **kw, **sel)

            return flat_force
        return lambda pos, mass: treecode.treecode_acc(
            pos, mass, tile=tile, theta=cfg.tree_theta,
            max_near=max_near, vip_tiles=cfg.tree_vip_tiles,
            mac_tau=cfg.tree_mac_tau, **kw
        )
    if solver == "pair_matrix":
        from n_body_problem_tpu.ops import pair_matrix

        return lambda pos, mass: pair_matrix.pair_matrix_acc(pos, mass, **kw)
    raise ValueError(f"unknown solver {solver!r}")
