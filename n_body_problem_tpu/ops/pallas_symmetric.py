"""Pallas symmetric half-pair force kernel — the "report method" on TPU.

The reference's final VERSION 3 kernel (``cal_acc_advanced``,
``kernel.cu:703-774``) evaluates each unordered pair once and applies
Newton's third law: a grid of 256-body tiles covering the strict upper
triangle, each tile accumulating the action on its row bodies in registers
and the reaction on its column bodies in shared memory via staggered atomics
(``kernel.cu:748-761``), flushed with global ``atomicAdd3``
(``kernel.cu:695-699``).

TPUs have no atomics and a sequential kernel grid, so the same N(N-1)/2
coverage is re-derived TPU-first:

* **Coverage — staggered diagonals, not triangle tiles.** Step ``(i, s)``
  processes row block ``i`` against column block ``j = (i + s) mod K``.
  ``s = 0`` is the in-tile strict upper triangle (masked); ``1 <= s <= S``
  sweeps the off-diagonals; for even K the last diagonal ``s = K/2`` pairs
  each block twice, so rows ``i >= K/2`` are gated off there. Every
  unordered pair is evaluated exactly once.
* **Everything VMEM-resident.** Positions/masses (pre-packed on the host as
  ``(1, 2N)`` lane vectors — doubled so the wrapped column window ``i + s``
  never needs modular index math) and both outputs live in VMEM for the
  whole sweep; the kernel slices tiles with dynamic lane offsets. Zero HBM
  traffic between grid steps. This caps the resident kernel at roughly
  N ~ 200k bodies per chip (VMEM is ~16 MB) — far beyond the single-chip
  O(N^2) practicality limit; larger N belongs to the multi-chip ring.
* **Reaction sums without atomics.** A resident ``(8, 2N)`` accumulator is
  read-modify-written at lane offset ``(i+s) * T`` — the ``atomicAdd``
  replacement is simply that the grid is sequential. The wrapped tail
  ``[N:2N)`` is folded back on the host side.
* **Data predication, not control flow.** The triangle mask and the even-K
  gate multiply into the pair weight; the kernel body is straight-line
  (better for Mosaic than duplicated ``pl.when`` branches).

Host-side convention: positions pre-scaled by ``compensate`` and masses by
``G * compensate^2`` so the hot loop is pure
``d = pj - pi; u = rsqrt(|d|^2 + eps2)^3`` with eps2 folded into the fma
chain — no constant multiplies per pair.
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
    rows_ref,   # (4, N)  row-side x, y, z, m (lane-packed)
    cols_ref,   # (4, 2N) column-side x, y, z, m doubled for wrap-free windows
    out_row_ref,  # (8, N)  action sums, sublanes 0..2
    out_col_ref,  # (8, 2N) reaction sums, sublanes 0..2 (tail folded outside)
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

    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _():
        out_row_ref[...] = jnp.zeros_like(out_row_ref)
        out_col_ref[...] = jnp.zeros_like(out_col_ref)

    ro = pl.multiple_of(i * t, t)
    co = pl.multiple_of((i + s) * t, t)
    # Row tile on sublanes, column tile on lanes.
    xi = rows_ref[0, pl.ds(ro, t)].reshape(t, 1)
    yi = rows_ref[1, pl.ds(ro, t)].reshape(t, 1)
    zi = rows_ref[2, pl.ds(ro, t)].reshape(t, 1)
    mi = rows_ref[3, pl.ds(ro, t)].reshape(t, 1)
    xj = cols_ref[0, pl.ds(co, t)].reshape(1, t)
    yj = cols_ref[1, pl.ds(co, t)].reshape(1, t)
    zj = cols_ref[2, pl.ds(co, t)].reshape(1, t)
    mj = cols_ref[3, pl.ds(co, t)].reshape(1, t)

    dx = xj - xi                       # (T, T)
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + (dy * dy + (dz * dz + eps2))
    inv = lax.rsqrt(r2)
    u = inv * inv * inv

    # Gate: strict upper triangle on the s=0 diagonal; skip the duplicated
    # half of the s=K/2 diagonal when K is even. Predicated data, no branch.
    gate = jnp.float32(1.0)
    if even_k:
        gate = jnp.where(jnp.logical_or(s < s_max, i < k_blocks // 2), gate, 0.0)
    rid = lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cid = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    tri = jnp.where(jnp.logical_or(s > 0, cid > rid), gate, 0.0)
    u = u * tri

    px = u * dx
    py = u * dy
    pz = u * dz

    # Action on row bodies: += sum_j (mj * p); lanes reduced to sublane vecs.
    ax = jnp.sum(mj * px, axis=1).reshape(1, t)
    ay = jnp.sum(mj * py, axis=1).reshape(1, t)
    az = jnp.sum(mj * pz, axis=1).reshape(1, t)
    out_row_ref[0:1, pl.ds(ro, t)] += ax
    out_row_ref[1:2, pl.ds(ro, t)] += ay
    out_row_ref[2:3, pl.ds(ro, t)] += az

    # Reaction on column bodies: -= sum_i (mi * p) (sublane reduce).
    cx = jnp.sum(mi * px, axis=0, keepdims=True)   # (1, T)
    cy = jnp.sum(mi * py, axis=0, keepdims=True)
    cz = jnp.sum(mi * pz, axis=0, keepdims=True)
    out_col_ref[0:1, pl.ds(co, t)] -= cx
    out_col_ref[1:2, pl.ds(co, t)] -= cy
    out_col_ref[2:3, pl.ds(co, t)] -= cz


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
    ms = mass.astype(f32) * f32(G * compensate * compensate)
    rows = jnp.concatenate([ps.T, ms.reshape(1, n)], axis=0)      # (4, N)
    cols = jnp.concatenate([rows, rows], axis=1)                  # (4, 2N)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_row, out_col = pl.pallas_call(
        functools.partial(
            _symmetric_kernel,
            eps2=float(eps2), tile=tile, k_blocks=k, s_max=s_max, even_k=even_k,
        ),
        grid=(k, s_max + 1),
        in_specs=[vmem, vmem],
        out_specs=(vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct((8, n), f32),
            jax.ShapeDtypeStruct((8, 2 * n), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * n * n,
            bytes_accessed=4 * 3 * n * 4 + 8 * 3 * n * 4,
            transcendentals=n * n // 2,
        ),
        interpret=interpret,
    )(rows, cols)

    reaction = out_col[:3, :n] + out_col[:3, n:]   # fold the wrapped tail
    return (out_row[:3, :] + reaction).T
