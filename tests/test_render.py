"""Renderer: projection math, sprite footprints, splat linearity, PNG/viewer."""

import pathlib
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from n_body_problem_tpu import make_state, models
from n_body_problem_tpu.render import (
    FrameWriter,
    OrbitCamera,
    render_state,
    splat_frame,
    sprite_footprint,
    tonemap,
    write_png,
)
from n_body_problem_tpu.render.camera import look_at, perspective
from n_body_problem_tpu.render.splat import project_to_screen
from n_body_problem_tpu.render.sprites import MASS_THRESHOLD


def test_look_at_origin_view():
    """Camera at +z looking at origin: a point at the origin maps to view
    center, depth -distance."""
    v = look_at([0, 0, 2], [0, 0, 0], [0, 1, 0])
    p = v @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, -2], atol=1e-6)


def test_projection_centers_origin():
    cam = OrbitCamera(distance=2.0, aspect=1.0)
    px, py, vis = project_to_screen(
        jnp.zeros((1, 3)), jnp.asarray(cam.view_projection()),
        jnp.zeros(3), 100, 100,
    )
    assert bool(vis[0])
    np.testing.assert_allclose([float(px[0]), float(py[0])], [50.0, 50.0], atol=1e-3)


def test_behind_camera_invisible():
    cam = OrbitCamera(distance=2.0, theta_deg=0.0)  # eye at +z
    pos = jnp.array([[0.0, 0.0, 10.0]])             # behind the camera
    _, _, vis = project_to_screen(
        pos, jnp.asarray(cam.view_projection()), jnp.zeros(3), 100, 100
    )
    assert not bool(vis[0])


def test_scale_factors_shrink():
    """The vertex shader divides by scale+1 (vertex_shader.glsl:11-14)."""
    cam = OrbitCamera(distance=2.0, aspect=1.0)
    vp = jnp.asarray(cam.view_projection())
    pos = jnp.array([[0.5, 0.0, 0.0]])
    px1, _, _ = project_to_screen(pos, vp, jnp.zeros(3), 100, 100)
    px2, _, _ = project_to_screen(pos, vp, jnp.asarray([9.0, 9.0, 9.0]), 100, 100)
    # scaled position is 10x closer to the axis -> nearer the center
    assert abs(float(px2[0]) - 50) < abs(float(px1[0]) - 50)


def test_sprite_footprint_shape():
    k = sprite_footprint(15)
    assert k.shape == (15, 15)
    assert k.max() > 0.5            # bright core
    assert k[0, 0] == 0.0           # discarded corners (dist > 1)
    c = k[7, 7]
    assert c == k.max()             # peak at the centre


def test_splat_is_additive():
    """Two bodies = sum of the single-body images (GL_ONE additive blend)."""
    cam = OrbitCamera(distance=3.0, aspect=1.0)
    vp = jnp.asarray(cam.view_projection())
    scales = jnp.zeros(3)
    kw = dict(width=64, height=64)
    p1 = jnp.array([[0.2, 0.0, 0.0]])
    p2 = jnp.array([[-0.2, 0.1, 0.0]])
    m = jnp.array([0.5])
    ones = jnp.array([True])
    f1 = splat_frame(p1, m, ones, vp, scales, **kw)
    f2 = splat_frame(p2, m, ones, vp, scales, **kw)
    both = splat_frame(
        jnp.concatenate([p1, p2]), jnp.concatenate([m, m]),
        jnp.array([True, True]), vp, scales, **kw,
    )
    np.testing.assert_allclose(np.asarray(both), np.asarray(f1 + f2), atol=1e-5)


def test_splat_mass_size_classes():
    """Heavy bodies draw the 15px sprite, light ones the 10px sprite
    (vertex_shader.glsl:19-23)."""
    cam = OrbitCamera(distance=3.0, aspect=1.0)
    vp = jnp.asarray(cam.view_projection())
    scales = jnp.zeros(3)
    heavy = splat_frame(
        jnp.zeros((1, 3)), jnp.array([MASS_THRESHOLD * 2]), jnp.array([True]),
        vp, scales, width=64, height=64,
    )
    light = splat_frame(
        jnp.zeros((1, 3)), jnp.array([MASS_THRESHOLD / 2]), jnp.array([True]),
        vp, scales, width=64, height=64,
    )
    n_heavy = int(np.count_nonzero(np.asarray(heavy).sum(-1) > 1e-6))
    n_light = int(np.count_nonzero(np.asarray(light).sum(-1) > 1e-6))
    assert n_heavy > n_light > 0


def test_padding_not_drawn():
    """Only real bodies rasterize (kernel.cu:1261 draws real_body_nums)."""
    from n_body_problem_tpu import pad_state

    state = pad_state(models.plummer(10, seed=0), multiple=16)
    cam = OrbitCamera(distance=5.0)
    frame_pad = render_state(state, cam, width=64, height=64)
    from n_body_problem_tpu.state import unpad_state

    frame_real = render_state(unpad_state(state), cam, width=64, height=64)
    np.testing.assert_allclose(np.asarray(frame_pad), np.asarray(frame_real), atol=1e-6)


def test_render_reference_like_scene():
    state = models.disk_galaxy(500, seed=0)
    cam = OrbitCamera(distance=2.0, phi_deg=30)
    frame = render_state(state, cam, scale_factors=(3, 3, 3), width=128, height=96)
    img = np.asarray(frame)
    assert img.shape == (96, 128, 3)
    assert img.max() > 0.0
    # golden hue: R > G > B wherever lit
    lit = img.sum(-1) > 1e-3
    assert (img[lit][:, 0] >= img[lit][:, 1]).all()
    assert (img[lit][:, 1] >= img[lit][:, 2]).all()


def test_png_roundtrip(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    img[2, 3] = [255, 128, 0]
    p = tmp_path / "t.png"
    write_png(p, img)
    raw = p.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # decode IDAT and verify the pixel survives
    idat_start = raw.index(b"IDAT") + 4
    length = int.from_bytes(raw[idat_start - 8 : idat_start - 4], "big")
    data = zlib.decompress(raw[idat_start : idat_start + length])
    row2 = data[2 * (8 * 3 + 1) + 1 :][: 8 * 3]
    assert row2[9:12] == bytes([255, 128, 0])


def test_frame_writer(tmp_path):
    frames = [np.random.rand(16, 16, 3).astype(np.float32) for _ in range(3)]
    with FrameWriter(tmp_path, exposure=0.5) as fw:
        for i, f in enumerate(frames):
            fw.submit(i, f)
    assert fw.frames_written == 3
    assert sorted(p.name for p in tmp_path.glob("*.png")) == [
        "frame_000000.png", "frame_000001.png", "frame_000002.png",
    ]


def test_tonemap_clamps():
    x = np.array([[-1.0, 0.5, 3.0]])
    np.testing.assert_array_equal(tonemap(x), [[0.0, 0.5, 1.0]])


def test_orbit_controls_match_reference():
    cam = OrbitCamera()
    cam.zoom(-1)       # wheel down -> x1.1 (kernel.cu:1017-1022)
    assert cam.distance == pytest.approx(1.1)
    cam.zoom(1)
    assert cam.distance == pytest.approx(0.99)
    cam.orbit(0, 10000)  # huge drag: phi clamps at +-89 (kernel.cu:1046)
    assert cam.phi_deg == -89.0
