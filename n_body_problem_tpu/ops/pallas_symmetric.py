"""Pallas symmetric half-pair force kernel — the "report method" on TPU.

The reference's final VERSION 3 kernel (``cal_acc_advanced``,
``kernel.cu:703-774``) evaluates each unordered pair once and applies
Newton's third law: tiles covering the strict upper triangle accumulate the
action on their row bodies in registers and the reaction on their column
bodies in shared memory via staggered atomics (``kernel.cu:748-761``),
flushed with global ``atomicAdd3`` (``kernel.cu:695-699``).

TPUs have no atomics and a sequential kernel grid, so the same N(N-1)/2
coverage is re-derived TPU-first:

* **Coverage — staggered diagonals, not triangle tiles.** Step ``(i, s)``
  processes row block ``i`` against column block ``j = (i + s) mod K``.
  ``s = 0`` is the in-tile strict upper triangle (masked); ``1 <= s <= S``
  sweeps the off-diagonals; for even K the last diagonal ``s = K/2`` pairs
  each block twice, so rows ``i >= K/2`` skip it. Every unordered pair is
  evaluated exactly once.
* **Everything VMEM-resident.** Body arrays (pre-packed on the host, the
  column side doubled so the wrapped window ``i + s`` needs no modular
  index math) and both accumulators stay in VMEM across the whole sweep —
  zero HBM traffic between grid steps. This caps the resident kernel at
  roughly N ~ 100k bodies per chip; larger N belongs to the multi-chip
  ring (and is impractical single-chip at O(N^2) anyway).
* **Reaction sums without atomics.** Resident accumulators are
  read-modify-written at dynamic lane/sublane offsets — the ``atomicAdd``
  replacement is simply that the TPU grid is sequential.
* **All per-tile reductions ride the MXU.** Each side needs four
  reductions over the pair tile (three force components + a weight sum for
  the d = p_j - p_i split). Both fold into one matmul per side against a
  ``[x, y, z, 1]`` panel:

      action_i   = (A @ [Xj 1])[:, :3] - x_i * (A @ [Xj 1])[:, 3]
      reaction_j = ([Xi; 1] @ B)[:3, :] - x_j * ([Xi; 1] @ B)[3, :]

  with ``A = u * m_j`` (action weights) and ``B = u * m_i`` (reaction
  weights). The VPU hot loop is only: 3 subs, 3 fma (r^2 with eps2 folded
  in), rsqrt, 2 cube muls, 2 weight muls — ~12 ops per *half* pair; the
  MXU contraction work is ~48 flops/half-pair, noise next to its peak.

Host-side convention: positions pre-scaled by ``compensate`` and masses by
``G * compensate^2`` (``cal_single_acclerate_without_mass_new``'s scaling,
``kernel.cu:665-692``, folded into the inputs), so there are no constant
multiplies in the hot loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _symmetric_kernel(
    posm_ref,    # (N, 4)  [x y z m] sublane-major: (T,1) row-body slices
    cols_ref,    # (4, 2N) [x y z m] lane-major, doubled: (1,T) column slices
    rows1_ref,   # (4, N)  [x y z 1] lane-major: (4,T) reaction-matmul lhs
    colsT_ref,   # (2N, 4) [x y z 1] sublane-major, doubled: (T,4) action rhs
    out_row_ref,  # (N, 8)  action sums in lanes 0..2
    out_col_ref,  # (8, 2N) reaction sums in sublanes 0..2 (tail folded outside)
    *,
    eps2: float,
    tile: int,
    k_blocks: int,
    s_max: int,
    even_k: bool,
):
    i = pl.program_id(0)
    s = pl.program_id(1)
    t = tile
    f32 = out_row_ref.dtype

    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _():
        out_row_ref[...] = jnp.zeros_like(out_row_ref)
        out_col_ref[...] = jnp.zeros_like(out_col_ref)

    if even_k:
        active = jnp.logical_or(s < s_max, i < k_blocks // 2)
    else:
        active = s <= s_max

    def tile_body(masked: bool):
        ro = pl.multiple_of(i * t, t)
        co = pl.multiple_of((i + s) * t, t)
        xi = posm_ref[pl.ds(ro, t), 0:1]          # (T, 1)
        yi = posm_ref[pl.ds(ro, t), 1:2]
        zi = posm_ref[pl.ds(ro, t), 2:3]
        mi = posm_ref[pl.ds(ro, t), 3:4]
        xj = cols_ref[0:1, pl.ds(co, t)]          # (1, T)
        yj = cols_ref[1:2, pl.ds(co, t)]
        zj = cols_ref[2:3, pl.ds(co, t)]
        mj = cols_ref[3:4, pl.ds(co, t)]

        dx = xj - xi                              # (T, T)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + (dy * dy + (dz * dz + eps2))
        inv = lax.rsqrt(r2)
        u = inv * inv * inv
        if masked:
            # Strict upper triangle on the s=0 diagonal (self) tile.
            rid = lax.broadcasted_iota(jnp.int32, (t, t), 0)
            cid = lax.broadcasted_iota(jnp.int32, (t, t), 1)
            u = jnp.where(cid > rid, u, 0.0)

        a_w = mj * u                              # action weights (T, T)
        b_w = mi * u                              # reaction weights (T, T)

        # Action on row bodies: one MXU contraction for all 4 reductions.
        rhs = colsT_ref[pl.ds(co, t), :]          # (T, 4) = [xj yj zj 1]
        s_row = jnp.dot(a_w, rhs, preferred_element_type=jnp.float32)  # (T, 4)
        ax = s_row[:, 0:1] - xi * s_row[:, 3:4]
        ay = s_row[:, 1:2] - yi * s_row[:, 3:4]
        az = s_row[:, 2:3] - zi * s_row[:, 3:4]
        upd = jnp.concatenate([ax, ay, az, jnp.zeros((t, 5), f32)], axis=1)
        out_row_ref[pl.ds(ro, t), :] += upd

        # Reaction on column bodies.
        lhs = rows1_ref[:, pl.ds(ro, t)]          # (4, T) = [xi; yi; zi; 1]
        s_col = jnp.dot(lhs, b_w, preferred_element_type=jnp.float32)  # (4, T)
        cx = s_col[0:1, :] - xj * s_col[3:4, :]
        cy = s_col[1:2, :] - yj * s_col[3:4, :]
        cz = s_col[2:3, :] - zj * s_col[3:4, :]
        cupd = jnp.concatenate([cx, cy, cz, jnp.zeros((5, t), f32)], axis=0)
        out_col_ref[:, pl.ds(co, t)] += cupd

    @pl.when(s == 0)
    def _():
        tile_body(masked=True)

    @pl.when(jnp.logical_and(active, s > 0))
    def _():
        tile_body(masked=False)


@functools.partial(
    jax.jit, static_argnames=("eps2", "compensate", "G", "tile", "interpret")
)
def symmetric_acc(
    pos: jax.Array,
    mass: jax.Array,
    *,
    eps2: float,
    compensate: float = 0.1,
    G: float = 1.0,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
) -> jax.Array:
    """acc (N, 3): every unordered pair evaluated once (Newton's 3rd law)."""
    n = pos.shape[0]
    if n % tile:
        raise ValueError(f"symmetric_acc: N={n} must be a multiple of tile={tile}")
    k = n // tile
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    even_k = k % 2 == 0
    s_max = k // 2 if even_k else (k - 1) // 2

    f32 = jnp.float32
    ps = pos.astype(f32) * f32(compensate)
    ms = (mass.astype(f32) * f32(G * compensate * compensate)).reshape(n, 1)
    ones = jnp.ones((n, 1), f32)
    posm = jnp.concatenate([ps, ms], axis=1)                  # (N, 4)
    pos1 = jnp.concatenate([ps, ones], axis=1)                # (N, 4)
    cols = posm.T                                             # (4, N)
    cols2 = jnp.concatenate([cols, cols], axis=1)             # (4, 2N)
    rows1 = pos1.T                                            # (4, N)
    colsT2 = jnp.concatenate([pos1, pos1], axis=0)            # (2N, 4)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_row, out_col = pl.pallas_call(
        functools.partial(
            _symmetric_kernel,
            eps2=float(eps2), tile=tile, k_blocks=k, s_max=s_max, even_k=even_k,
        ),
        grid=(k, s_max + 1),
        in_specs=[vmem] * 4,
        out_specs=(vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct((n, 8), f32),
            jax.ShapeDtypeStruct((8, 2 * n), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * n,
            bytes_accessed=16 * n * 4,
            transcendentals=n * n // 2,
        ),
        interpret=interpret,
    )(posm, cols2, rows1, colsT2)

    reaction = out_col[:3, :n] + out_col[:3, n:]   # fold the wrapped tail
    return out_row[:, :3] + reaction.T
