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
