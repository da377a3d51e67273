"""Physics diagnostics & validation probes.

The reference's only runtime checks were printf probes: a first-5-bodies dump
(``printFirstDataPoint``, ``kernel.cu:930-936``), a max-|x|,|y|,|z|,|m| scan
(``findMaxAbsValues``, ``kernel.cu:938-965``) and a dev-history overspeed
print (``project_develop_code.cu:1089-1091``). This module provides those
plus the conserved-quantity diagnostics the reference lacked: kinetic /
potential / total energy, linear & angular momentum, and drift tracking —
the north-star validation metric in BASELINE.md.

All functions mask padding bodies via ``state.n_real``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from n_body_problem_tpu.config import SimConfig
from n_body_problem_tpu.state import SimState


def _mask(state: SimState) -> jax.Array:
    return state.real_mask().astype(state.pos.dtype)


def kinetic_energy(state: SimState) -> jax.Array:
    m = _mask(state) * state.mass
    return 0.5 * jnp.sum(m * jnp.sum(state.vel * state.vel, axis=-1))


def potential_energy(state: SimState, cfg: SimConfig, block_size: int = 256) -> jax.Array:
    """Softened pairwise potential, consistent with the force law.

    The compensated force (kernel.cu:665-692) is the exact gradient of
    ``phi_ij = -G m_i m_j * c * (c^2 r^2 + eps2)^(-1/2)``, so energy computed
    here is conserved (up to integrator error) under any of the solvers.
    O(N^2), evaluated in row blocks to bound memory.
    """
    c = cfg.compensate
    c2 = c * c
    n = state.pos.shape[0]
    pad = (-n) % block_size
    pos = jnp.pad(state.pos, ((0, pad), (0, 0)))
    m = jnp.pad(_mask(state) * state.mass, (0, pad))
    nb = pos.shape[0] // block_size
    idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], 1), 0)[:, 0]

    def chunk(args):
        pos_i, m_i, idx_i = args
        d = pos[None, :, :] - pos_i[:, None, :]
        r2 = jnp.sum(d * d, axis=-1)
        inv = lax.rsqrt(c2 * r2 + cfg.eps2)
        phi = (cfg.G * c) * (m_i[:, None] * m[None, :]) * inv
        off_diag = idx_i[:, None] != idx[None, :]
        return -0.5 * jnp.sum(jnp.where(off_diag, phi, 0.0))

    parts = lax.map(
        chunk,
        (
            pos.reshape(nb, block_size, 3),
            m.reshape(nb, block_size),
            idx.reshape(nb, block_size),
        ),
    )
    return jnp.sum(parts)


def total_energy(state: SimState, cfg: SimConfig) -> jax.Array:
    return kinetic_energy(state) + potential_energy(state, cfg)


def momentum(state: SimState) -> jax.Array:
    m = (_mask(state) * state.mass)[:, None]
    return jnp.sum(m * state.vel, axis=0)


def angular_momentum(state: SimState) -> jax.Array:
    m = (_mask(state) * state.mass)[:, None]
    return jnp.sum(m * jnp.cross(state.pos, state.vel), axis=0)


def center_of_mass(state: SimState) -> jax.Array:
    m = (_mask(state) * state.mass)[:, None]
    total = jnp.sum(m)
    return jnp.sum(m * state.pos, axis=0) / jnp.maximum(total, 1e-30)


def max_abs(state: SimState, count: int | None = None) -> jax.Array:
    """max |x|, |y|, |z|, |mass| over real bodies (``findMaxAbsValues`` role,
    ``kernel.cu:938-965``).

    ``count`` scans exactly the first ``count`` bodies regardless of
    ``n_real`` — the reference hardcodes 20225 at its callsite
    (``kernel.cu:1130``, quirk Q2); here the count is clamped to N instead
    of reading out of bounds."""
    if count is not None:
        k = min(count, state.n)
        pm = jnp.abs(state.pos[:k])
        mm = jnp.abs(state.mass[:k])
        return jnp.concatenate([jnp.max(pm, axis=0), jnp.max(mm)[None]])
    w = _mask(state)
    pm = jnp.abs(state.pos) * w[:, None]
    mm = jnp.abs(state.mass) * w
    return jnp.concatenate([jnp.max(pm, axis=0), jnp.max(mm)[None]])


def overspeed_count(state: SimState, vmax: float = 10.0) -> jax.Array:
    """Bodies exceeding |v| >= vmax (dev guard D4, SPEED_MAX=10)."""
    speed2 = jnp.sum(state.vel * state.vel, axis=-1)
    return jnp.sum((speed2 >= vmax * vmax) & state.real_mask())


def first_bodies(state: SimState, k: int = 5) -> str:
    """Text dump of the first k bodies (``printFirstDataPoint`` role)."""
    import numpy as np

    pos = np.asarray(state.pos[:k])
    mass = np.asarray(state.mass[:k])
    lines = [
        f"No.{i} data point: x={pos[i,0]:f}, y={pos[i,1]:f}, z={pos[i,2]:f}, w={mass[i]:f}"
        for i in range(min(k, state.n))
    ]
    return "\n".join(lines)


def summary(state: SimState, cfg: SimConfig) -> dict:
    """Host-side dict of all diagnostics (fetches from device)."""
    ke = kinetic_energy(state)
    pe = potential_energy(state, cfg)
    p = momentum(state)
    L = angular_momentum(state)
    ma = max_abs(state)
    vmax = cfg.vmax_guard if cfg.vmax_guard > 0 else 10.0
    over = overspeed_count(state, vmax)
    return {
        "time": float(state.time),
        "step": int(state.step),
        "n_real": state.n_real,
        "n_padded": state.n,
        "kinetic": float(ke),
        "potential": float(pe),
        "energy": float(ke + pe),
        "momentum": [float(x) for x in p],
        "angular_momentum": [float(x) for x in L],
        "max_abs_xyzm": [float(x) for x in ma],
        "overspeed": int(over),
    }
