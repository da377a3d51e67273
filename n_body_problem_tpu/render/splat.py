"""Device-side splat renderer.

The TPU replacement for the reference's CUDA-GL interop render path
(``kernel.cu:1164-1176, 1245-1262``): instead of handing the position
buffer to OpenGL for point-sprite rasterization with additive blending,
the frame is produced on-device in three steps, all inside one ``jit``:

1. **Project** — scale by ``1 / (scale_factors + 1)``, apply the orbit
   camera's view-projection, perspective-divide, viewport transform
   (matching ``vertex_shader.glsl`` + ``kernel.cu:1247-1258``).
2. **Scatter** — bilinear-deposit a unit impulse per body into one weight
   plane per point-size class (15 px for mass > 0.02, 10 px otherwise).
   ``.at[].add(mode="drop")`` gives GL-style clipping for free; padding
   bodies are masked (only ``real_body_nums`` drawn, ``kernel.cu:1261``).
3. **Convolve** — one multi-channel ``lax.conv`` with the precomputed
   ``intensity * alpha`` footprints. Additive blending is linear, so
   scatter+convolve is mathematically identical to rasterizing every
   sprite — but it runs on the MXU instead of serializing scatters.

The result is a float32 luminance accumulation times the golden sprite
color — the same image GL produces, without a host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from n_body_problem_tpu.render.camera import OrbitCamera
from n_body_problem_tpu.render.sprites import (
    GOLDEN_COLOR,
    MASS_THRESHOLD,
    stacked_footprints,
)
from n_body_problem_tpu.state import SimState


def project_to_screen(
    pos: jax.Array,               # (N, 3)
    view_projection: jax.Array,   # (4, 4)
    scale_factors: jax.Array,     # (3,)
    width: int,
    height: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (px, py, visible): window coords (y down) + frustum mask."""
    p = pos / (scale_factors + 1.0)
    ones = jnp.ones((p.shape[0], 1), p.dtype)
    clip = jnp.concatenate([p, ones], axis=1) @ view_projection.T   # (N, 4)
    w = clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[:, :3] / safe_w[:, None]
    px = (ndc[:, 0] * 0.5 + 0.5) * width
    py = (1.0 - (ndc[:, 1] * 0.5 + 0.5)) * height
    visible = (
        (w > 0)
        & (ndc[:, 0] >= -1.1) & (ndc[:, 0] <= 1.1)
        & (ndc[:, 1] >= -1.1) & (ndc[:, 1] <= 1.1)
        & (ndc[:, 2] >= -1.0) & (ndc[:, 2] <= 1.0)
    )
    return px, py, visible


def _bilinear_scatter(
    px: jax.Array, py: jax.Array, weight: jax.Array, height: int, width: int
) -> jax.Array:
    """Deposit ``weight`` at (px, py) over the 4 neighbouring pixels."""
    x0 = jnp.floor(px - 0.5)
    y0 = jnp.floor(py - 0.5)
    fx = (px - 0.5) - x0
    fy = (py - 0.5) - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    img = jnp.zeros((height, width), dtype=jnp.float32)
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            img = img.at[iy0 + dy, ix0 + dx].add(weight * wy * wx, mode="drop")
    return img


@functools.partial(jax.jit, static_argnames=("width", "height"))
def splat_frame(
    pos: jax.Array,
    mass: jax.Array,
    real_mask: jax.Array,
    view_projection: jax.Array,
    scale_factors: jax.Array,
    *,
    width: int = 1024,
    height: int = 768,
) -> jax.Array:
    """(H, W, 3) float32 additive frame (unclamped luminance * color)."""
    px, py, visible = project_to_screen(pos, view_projection, scale_factors, width, height)
    draw = (visible & real_mask).astype(jnp.float32)

    large = (mass > MASS_THRESHOLD).astype(jnp.float32)
    planes = jnp.stack(
        [
            _bilinear_scatter(px, py, draw * large, height, width),
            _bilinear_scatter(px, py, draw * (1.0 - large), height, width),
        ]
    )                                                   # (2, H, W)

    kernels = jnp.asarray(stacked_footprints())         # (2, S, S)
    lum = lax.conv_general_dilated(
        planes[None],                                   # (1, 2, H, W)
        kernels[None],                                  # (O=1, I=2, S, S)
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]                                             # (H, W)
    color = jnp.asarray(GOLDEN_COLOR)
    return lum[:, :, None] * color[None, None, :]


def render_state(
    state: SimState,
    camera: OrbitCamera,
    scale_factors=(0.0, 0.0, 0.0),
    *,
    width: int = 1024,
    height: int = 768,
) -> jax.Array:
    """Convenience wrapper: render a SimState with an OrbitCamera."""
    return splat_frame(
        state.pos,
        state.mass,
        state.real_mask(),
        jnp.asarray(camera.view_projection()),
        jnp.asarray(np.asarray(scale_factors, np.float32)),
        width=width,
        height=height,
    )
