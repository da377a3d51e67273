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

Host-side convention: masses are pre-scaled by ``G * compensate^3`` and the
``compensate`` factor applies to the *squared distance* in-kernel
(``rsqrt(r2 * c^2 + eps2)``) — algebraically the reference's pair math
(``cal_single_acclerate_without_mass_new``, ``kernel.cu:665-692``).
Positions are deliberately NOT pre-scaled: c = 0.1 is not a power of two,
so scaling before the subtraction would round coordinates ahead of the
cancellation and corrupt close-pair separations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _split_bf16(a):
    """hi/lo bf16 decomposition: hi + lo reproduces a to ~2^-16 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16x3(a_hi, a_lo, b_hi, b_lo):
    """f32-accurate matmul from three bf16 MXU passes.

    Mosaic's f32 matmul (Precision.HIGHEST) runs six bf16 passes; for this
    kernel's accumulation panels the lo*lo cross term is far below fp32
    rounding, so three passes (hi*hi + hi*lo + lo*hi) recover ~f32 accuracy
    at half the MXU cost. Coordinate-panel splits are precomputed on the
    host; weight-matrix splits happen in-kernel.
    """
    f32 = jnp.float32
    return (
        jnp.dot(a_hi, b_hi, preferred_element_type=f32)
        + jnp.dot(a_hi, b_lo, preferred_element_type=f32)
        + jnp.dot(a_lo, b_hi, preferred_element_type=f32)
    )


def _symmetric_kernel(
    *refs,
    c2: float,
    eps2: float,
    tile: int,
    k_blocks: int,
    s_max: int,
    even_k: bool,
    near_s: int,
):
    # Ref layout (see symmetric_acc):
    #   posm_ref   (T, 4) block   [x y z m] row-body panel (sublane-major)
    #   cols_ref   (4, 2N) resident, [x y z m] lane-major, doubled for wrap
    #   centers    (K, 4) resident tile centroids (reaction panel centring)
    #   rows1*     (4, N) resident  [x y z 1]: reaction-matmul lhs
    #   out_row    (T, 8) block     action sums (lane-reduced at s == s_max)
    #   out_col    (8, 2N) resident reaction sums (tail folded outside)
    #   acc_x/y/z  (T, T) VMEM scratch — deferred action accumulators
    # The ACTION side accumulates w*d on the VPU across the s sweep (exact,
    # and ~15% faster than the 6-pass f32 matmul it replaces — measured);
    # the REACTION side contracts on the MXU: diagonals s <= near_s with
    # exact-f32 dots, s > near_s with three-pass bf16 dots.
    use_f32 = near_s >= 0
    use_fast = near_s < s_max
    it = iter(refs)
    posm_ref, cols_ref, centers_ref = next(it), next(it), next(it)
    if use_f32:
        rows1_f32_ref = next(it)
    if use_fast:
        rows1_hi_ref, rows1_lo_ref = next(it), next(it)
    out_row_ref, out_col_ref, acc_x, acc_y, acc_z = (
        next(it), next(it), next(it), next(it), next(it)
    )
    i = pl.program_id(0)
    s = pl.program_id(1)
    t = tile
    f32 = out_col_ref.dtype

    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _():
        out_col_ref[...] = jnp.zeros_like(out_col_ref)

    if even_k:
        active = jnp.logical_or(s < s_max, i < k_blocks // 2)
    else:
        active = s <= s_max

    def tile_body(masked: bool, fast: bool):
        ro = pl.multiple_of(i * t, t)
        co = pl.multiple_of((i + s) * t, t)
        xi = posm_ref[:, 0:1]                     # (T, 1)
        yi = posm_ref[:, 1:2]
        zi = posm_ref[:, 2:3]
        mi = posm_ref[:, 3:4]
        xj = cols_ref[0:1, pl.ds(co, t)]          # (1, T)
        yj = cols_ref[1:2, pl.ds(co, t)]
        zj = cols_ref[2:3, pl.ds(co, t)]
        mj = cols_ref[3:4, pl.ds(co, t)]

        # Subtract FIRST, scale after: pre-scaling coordinates by c = 0.1
        # on the host would round them before cancellation and wreck
        # close-pair separations. Scaling the squared distance is
        # algebraically identical to the reference's d*c pre-scale
        # (kernel.cu:672-679), numerically strictly better.
        dx = xj - xi                              # (T, T)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz
        inv = lax.rsqrt(r2 * c2 + eps2)
        u = inv * inv * inv
        if masked:
            # Strict upper triangle on the s=0 diagonal (self) tile.
            rid = lax.broadcasted_iota(jnp.int32, (t, t), 0)
            cid = lax.broadcasted_iota(jnp.int32, (t, t), 1)
            u = jnp.where(cid > rid, u, 0.0)

        a_w = mj * u                              # action weights (T, T)
        b_w = mi * u                              # reaction weights (T, T)

        # Action on row bodies: deferred per-lane VPU accumulation (exact),
        # lane-reduced once per row block at s == s_max.
        @pl.when(s == 0)
        def _():
            acc_x[...] = a_w * dx
            acc_y[...] = a_w * dy
            acc_z[...] = a_w * dz

        @pl.when(s > 0)
        def _():
            acc_x[...] += a_w * dx
            acc_y[...] += a_w * dy
            acc_z[...] += a_w * dz

        # Reaction on column bodies: lhs = (4, T) [xi; yi; zi; 1].
        if fast:
            b_hi, b_lo = _split_bf16(b_w)
            s_col = _dot_bf16x3(rows1_hi_ref[:, pl.ds(ro, t)],
                                rows1_lo_ref[:, pl.ds(ro, t)], b_hi, b_lo)
        else:
            s_col = jnp.dot(rows1_f32_ref[:, pl.ds(ro, t)], b_w,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        ci = centers_ref[pl.ds(i, 1), :]          # (1, 4) row-tile centre
        cx = s_col[0:1, :] - (xj - ci[0, 0]) * s_col[3:4, :]
        cy = s_col[1:2, :] - (yj - ci[0, 1]) * s_col[3:4, :]
        cz = s_col[2:3, :] - (zj - ci[0, 2]) * s_col[3:4, :]
        cupd = jnp.concatenate([cx, cy, cz, jnp.zeros((5, t), f32)], axis=0)
        out_col_ref[:, pl.ds(co, t)] += cupd

    diag_fast = not use_f32

    @pl.when(s == 0)
    def _():
        tile_body(masked=True, fast=diag_fast)

    if use_f32 and use_fast:
        @pl.when(jnp.logical_and(active, jnp.logical_and(s > 0, s <= near_s)))
        def _():
            tile_body(masked=False, fast=False)

        @pl.when(jnp.logical_and(active, s > near_s))
        def _():
            tile_body(masked=False, fast=True)
    else:
        @pl.when(jnp.logical_and(active, s > 0))
        def _():
            tile_body(masked=False, fast=diag_fast)

    # Lane-reduce the deferred action accumulators once per row block.
    # Must trace AFTER the tile bodies so the s == s_max (even-K
    # half-active final diagonal) contributions are already accumulated;
    # also runs on inactive rows, whose accumulators hold the full sweep.
    @pl.when(s == s_max)
    def _():
        out_row_ref[...] = jnp.concatenate(
            [
                jnp.sum(acc_x[...], axis=1, keepdims=True),
                jnp.sum(acc_y[...], axis=1, keepdims=True),
                jnp.sum(acc_z[...], axis=1, keepdims=True),
                jnp.zeros((t, 5), f32),
            ],
            axis=1,
        )


@functools.partial(
    jax.jit,
    static_argnames=("eps2", "compensate", "G", "tile", "precision", "interpret"),
)
def symmetric_acc(
    pos: jax.Array,
    mass: jax.Array,
    *,
    eps2: float,
    compensate: float = 0.1,
    G: float = 1.0,
    tile: int = DEFAULT_TILE,
    precision: str = "f32",
    interpret: bool | None = None,
) -> jax.Array:
    """acc (N, 3): every unordered pair evaluated once (Newton's 3rd law).

    ``precision``:

    - ``"f32"`` (default): exact fp32 accumulation panels
      (``Precision.HIGHEST`` — six bf16 MXU passes). Matches the direct
      kernel to ~1e-5.
    - ``"bf16x3"``: three bf16 passes, ~20% faster end-to-end, but the hi/lo
      split's 2^-17 representation floor times the panel-vs-force
      cancellation ratio (~50x even with Morton-sorted, tile-centered
      coordinates) leaves ~1% p99 force error. Experimental fast-math only.
    """
    n = pos.shape[0]
    if n % tile:
        raise ValueError(f"symmetric_acc: N={n} must be a multiple of tile={tile}")
    if precision not in ("f32", "bf16x3", "mixed"):
        raise ValueError(f"unknown precision {precision!r}")
    k = n // tile
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    even_k = k % 2 == 0
    s_max = k // 2 if even_k else (k - 1) // 2
    # Diagonals s <= near_s run exact-f32 dots; the rest run bf16x3.
    near_s = {"f32": s_max, "bf16x3": -1, "mixed": min(1, s_max)}[precision]
    use_f32 = near_s >= 0
    use_fast = near_s < s_max

    f32 = jnp.float32
    c2 = compensate * compensate
    ps = pos.astype(f32)
    ms = (mass.astype(f32) * f32(G * c2 * compensate)).reshape(n, 1)
    ones = jnp.ones((n, 1), f32)
    posm = jnp.concatenate([ps, ms], axis=1)                  # (N, 4)
    cols = posm.T                                             # (4, N)
    cols2 = jnp.concatenate([cols, cols], axis=1)             # (4, 2N)
    # Tile-centered accumulation panels (see kernel corrections).
    centers = jnp.mean(ps.reshape(k, tile, 3), axis=1)        # (K, 3)
    ps_c = (ps.reshape(k, tile, 3) - centers[:, None, :]).reshape(n, 3)
    centers4 = jnp.concatenate([centers, jnp.zeros((k, 1), f32)], axis=1)  # (K, 4)
    pos1 = jnp.concatenate([ps_c, ones], axis=1)              # (N, 4) centered
    rows1 = pos1.T                                            # (4, N)

    # Narrow sublane-major panels are *blocked* (a resident (N, 4) array
    # would pad lanes 4 -> 128 in VMEM, 32x memory); wide lane-major arrays
    # stay whole-array resident.
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    row_panel = pl.BlockSpec((tile, 4), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    inputs = [posm, cols2, centers4]
    in_specs = [row_panel, vmem, vmem]
    if use_f32:
        inputs += [rows1]
        in_specs += [vmem]
    if use_fast:
        rows1_hi, rows1_lo = _split_bf16(rows1)
        inputs += [rows1_hi, rows1_lo]
        in_specs += [vmem, vmem]

    out_row, out_col = pl.pallas_call(
        functools.partial(
            _symmetric_kernel,
            c2=float(c2), eps2=float(eps2), tile=tile, k_blocks=k,
            s_max=s_max, even_k=even_k, near_s=near_s,
        ),
        grid=(k, s_max + 1),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, 8), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            vmem,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 8), f32),
            jax.ShapeDtypeStruct((8, 2 * n), f32),
        ),
        scratch_shapes=[pltpu.VMEM((tile, tile), f32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=12 * n * n,
            bytes_accessed=16 * n * 4,
            transcendentals=n * n // 2,
        ),
        interpret=interpret,
    )(*inputs)

    reaction = out_col[:3, :n] + out_col[:3, n:]   # fold the wrapped tail
    return out_row[:, :3] + reaction.T
