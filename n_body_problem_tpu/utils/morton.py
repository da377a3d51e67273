"""Morton (Z-order) spatial sorting.

Reordering bodies along a space-filling curve makes kernel tiles spatially
compact, which (a) shrinks the dynamic range of the symmetric kernel's
accumulation panels — tile-centered coordinates then make the bf16x3 MXU
path accurate — and (b) is the natural prerequisite for any future
hierarchical solver. Sorting permutes body order; the force physics is
permutation-invariant, so correctness never depends on it.
"""

from __future__ import annotations

import numpy as np


def _spread_bits_21(v: np.ndarray) -> np.ndarray:
    """Interleave 21-bit integers with two zero bits (uint64)."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_keys(pos: np.ndarray, bits: int = 21) -> np.ndarray:
    """(N,) uint64 Z-order keys from (N, 3) positions (host-side)."""
    pos = np.asarray(pos, dtype=np.float64)
    lo = pos.min(axis=0)
    span = pos.max(axis=0) - lo
    span = np.where(span > 0, span, 1.0)
    scale = (2**bits - 1) / span
    q = np.clip((pos - lo) * scale, 0, 2**bits - 1).astype(np.uint64)
    return (
        _spread_bits_21(q[:, 0])
        | (_spread_bits_21(q[:, 1]) << np.uint64(1))
        | (_spread_bits_21(q[:, 2]) << np.uint64(2))
    )


def morton_argsort(pos: np.ndarray) -> np.ndarray:
    """Permutation putting bodies in Z-order."""
    return np.argsort(morton_keys(pos), kind="stable")


def apply_permutation(state, perm: np.ndarray):
    """Reorder a SimState's bodies (returns a new state; padding must be
    re-applied afterwards if perm covers only real bodies)."""
    from n_body_problem_tpu.state import SimState
    import jax.numpy as jnp

    idx = jnp.asarray(perm)
    return SimState(
        pos=state.pos[idx],
        vel=state.vel[idx],
        mass=state.mass[idx],
        eps=state.eps[idx],
        acc=state.acc[idx],
        time=state.time,
        step=state.step,
        n_real=state.n_real,
    )


# ------------------------------------------------------------ device-side
def _spread_bits_10_jnp(v):
    """Interleave 10-bit integers with two zero bits (int32, on device)."""
    import jax.numpy as jnp

    x = v.astype(jnp.int32)
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_keys_device(pos, n_real):
    """(N,) int32 Z-order keys, jittable (10 bits/dim = 30-bit codes —
    plenty to order tiles; the host path keeps 21-bit precision).

    Padding bodies (slots >= n_real) get the maximal key so a stable sort
    keeps them at the end — the layout invariant every kernel relies on.
    """
    import jax
    import jax.numpy as jnp

    pos = pos.astype(jnp.float32)
    n = pos.shape[0]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            < n_real)
    lo = jnp.min(jnp.where(mask[:, None], pos, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], pos, -jnp.inf), axis=0)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    scale = 1023.0 / span
    q = jnp.clip((pos - lo[None, :]) * scale[None, :], 0.0, 1023.0
                 ).astype(jnp.int32)
    key = (_spread_bits_10_jnp(q[:, 0])
           | (_spread_bits_10_jnp(q[:, 1]) << 1)
           | (_spread_bits_10_jnp(q[:, 2]) << 2))
    return jnp.where(mask, key, jnp.int32(0x7FFFFFFF))


def device_resort(state, ids):
    """Z-order a SimState on device (jittable; used inside scanned runs).

    ``ids`` tracks body identity across permutations (``ids[i]`` = the
    input slot of the body now at slot i). Padding stays at the end.
    """
    import jax.numpy as jnp

    from n_body_problem_tpu.state import SimState

    key = morton_keys_device(state.pos, state.n_real)
    perm = jnp.argsort(key, stable=True)
    return SimState(
        pos=state.pos[perm],
        vel=state.vel[perm],
        mass=state.mass[perm],
        eps=state.eps[perm],
        acc=state.acc[perm],
        time=state.time,
        step=state.step,
        n_real=state.n_real,
    ), ids[perm]
