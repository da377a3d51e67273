"""Treecode-lite: block Barnes-Hut on the Morton tiling (approximate).

The reference is exact brute force; this solver goes *past* it: with bodies
Morton-sorted (``SimConfig.morton_sort``), consecutive ``tile``-body blocks
are spatially compact clusters, so a one-level Barnes-Hut split applies:

- **Near field (exact)**: for each tile, the ``max_near`` closest tiles
  (always including itself) get the full softened pair interaction. Static
  shapes: every tile has exactly ``max_near`` neighbours — the list is the
  top-k by centroid distance, so an "overflow" degrades gracefully into the
  far field rather than branching.
- **Far field (monopole)**: every other tile acts as a point mass at its
  centre of mass. O(N * K) work — negligible.

The acceptance knob is ``max_near`` (a static shape), not the classic
dynamic opening angle: tiles keep their k nearest neighbours, so compute
cost is fixed and fully jittable. The price is accuracy: the fixed-k
acceptance admits borderline tiles whose distance is comparable to their
radius, so the monopole error is large — measured ~2-4% median relative
force error at near fractions of 12-25% on a Morton-sorted Plummer sphere
(and exact as max_near -> K). A production-grade variant needs a true
opening-criterion acceptance with variable-length near lists (compaction),
which is future work; this module is the EXPERIMENTAL scaffold: tile
summaries, top-k neighbour lists, masked far field, gathered near panels.

TPU shape: the near field gathers neighbour tiles into a dense
``(K, M*T)`` panel and reuses the broadcast pair math (VPU); the far field
is one ``(N, K)`` broadcast. Everything is static-shaped — no trees, no
pointer chasing, no recursion.

This is NOT bug-for-bug the reference's physics — it exists to go faster
than exact brute force can (`docs/numerics.md` shows why exact f32 caps at
~1.2e11 pairs/s/chip on v5e). The exact solvers remain the defaults.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def tile_summaries(pos: jax.Array, mass: jax.Array, tile: int):
    """Per-tile centre of mass, total mass, bounding radius.

    Returns (centroids (K,3), masses (K,), radii (K,)). Massless padding
    tiles get their geometric handling from zero total mass (no far-field
    contribution) — their centroid falls back to the tile mean position.
    """
    n = pos.shape[0]
    k = n // tile
    p = pos.reshape(k, tile, 3)
    m = mass.reshape(k, tile)
    m_tot = jnp.sum(m, axis=1)                                  # (K,)
    safe = jnp.maximum(m_tot, 1e-30)
    com = jnp.sum(m[..., None] * p, axis=1) / safe[:, None]     # (K, 3)
    com = jnp.where(m_tot[:, None] > 0, com, jnp.mean(p, axis=1))
    r = jnp.sqrt(jnp.max(jnp.sum((p - com[:, None, :]) ** 2, axis=-1), axis=1))
    return com, m_tot, r


def near_tile_lists(centroids: jax.Array, max_near: int):
    """(K, M) indices of each tile's M closest tiles (itself first)."""
    d2 = jnp.sum(
        (centroids[:, None, :] - centroids[None, :, :]) ** 2, axis=-1
    )                                                           # (K, K)
    k = d2.shape[0]
    d2 = d2.at[jnp.arange(k), jnp.arange(k)].set(-1.0)          # self is closest
    _, idx = lax.top_k(-d2, max_near)                           # ascending distance
    return idx                                                  # (K, M)


@functools.partial(
    jax.jit,
    static_argnames=("eps2", "compensate", "G", "tile", "max_near"),
)
def treecode_acc(
    pos: jax.Array,
    mass: jax.Array,
    *,
    eps2: float,
    compensate: float = 0.1,
    G: float = 1.0,
    tile: int = 512,
    max_near: int = 16,
) -> jax.Array:
    """Approximate acc (N, 3): exact near tiles + monopole far field."""
    n = pos.shape[0]
    if n % tile:
        raise ValueError(f"treecode_acc: N={n} must be a multiple of tile={tile}")
    k = n // tile
    max_near = min(max_near, k)
    c2 = compensate * compensate
    gc3 = G * c2 * compensate
    f32 = jnp.float32
    pos = pos.astype(f32)
    mass = mass.astype(f32)

    com, m_tot, _ = tile_summaries(pos, mass, tile)
    near = near_tile_lists(com, max_near)                       # (K, M)

    # ---- far field: every tile's monopole on every body, near tiles masked.
    # Monopole only, deliberately: the fixed-k acceptance admits tiles whose
    # centroid distance is comparable to their radius, where the multipole
    # series has not converged — adding the quadrupole term there makes the
    # error WORSE (measured; the formula itself validates 10x better in the
    # convergent regime). Higher orders need a true opening-criterion
    # acceptance with variable-length near lists (future work).
    # (K, K) tile-level near mask.
    tile_near = jnp.any(
        near[:, :, None] == jnp.arange(k)[None, None, :], axis=1
    )                                                           # (K, K)

    # Chunk bodies so the (chunk, K, 3) broadcast never materializes an
    # O(N*K) tensor for large N (1M bodies x 2048 tiles would be ~25 GB).
    def far_chunk(args):
        pos_c, mask_c = args                                    # (C,3), (C,K)
        d = com[None, :, :] - pos_c[:, None, :]                 # (C, K, 3)
        r2 = jnp.sum(d * d, axis=-1)
        inv = lax.rsqrt(c2 * r2 + eps2)
        w = (gc3 * m_tot)[None, :] * (inv * inv * inv)
        w = jnp.where(mask_c, 0.0, w)
        return jnp.einsum("nk,nkc->nc", w, d, precision=lax.Precision.HIGHEST)

    body_tile = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] // tile
    near_mask = tile_near[body_tile]                            # (N, K)
    chunk = min(n, 8192)
    acc_far = lax.map(
        far_chunk,
        (pos.reshape(n // chunk, chunk, 3),
         near_mask.reshape(n // chunk, chunk, k)),
    ).reshape(n, 3)

    # ---- near field: exact pair math against the gathered neighbour panel.
    p_tiles = pos.reshape(k, tile, 3)
    m_tiles = mass.reshape(k, tile)
    neigh_pos = p_tiles[near].reshape(k, max_near * tile, 3)    # (K, M*T, 3)
    neigh_mass = m_tiles[near].reshape(k, max_near * tile)

    def near_tile(args):
        pi, pj, mj = args
        dn = pj[None, :, :] - pi[:, None, :]                    # (T, M*T, 3)
        r2n = jnp.sum(dn * dn, axis=-1)
        invn = lax.rsqrt(c2 * r2n + eps2)
        wn = (gc3 * mj)[None, :] * (invn * invn * invn)
        return jnp.einsum("ij,ijc->ic", wn, dn, precision=lax.Precision.HIGHEST)

    acc_near = lax.map(near_tile, (p_tiles, neigh_pos, neigh_mass)).reshape(n, 3)
    return acc_near + acc_far
