"""Live HTTP viewer: page, stream, camera controls (C19/L3b role)."""

import time
import urllib.request

import numpy as np
import pytest

from n_body_problem_tpu.render import OrbitCamera
from n_body_problem_tpu.render.server import LiveViewer


@pytest.fixture()
def viewer():
    cam = OrbitCamera(distance=2.0)
    v = LiveViewer(0, cam)  # port 0: ephemeral
    frame = np.zeros((48, 64, 3), np.float32)
    frame[10:20, 20:40, :] = 1.0
    v.submit(frame)
    deadline = time.time() + 5
    while v._jpeg is None and time.time() < deadline:
        time.sleep(0.01)
    assert v._jpeg is not None, "encoder thread never produced a frame"
    yield v
    v.close()


def _get(viewer, path):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{viewer.port}{path}", timeout=5
    )


def test_page_and_stats(viewer):
    body = _get(viewer, "/").read().decode()
    assert "/stream" in body and "orbit" in body
    import json

    stats = json.loads(_get(viewer, "/stats").read())
    assert "step" in stats and "ms_per_step" in stats


def test_stream_yields_jpeg(viewer):
    resp = _get(viewer, "/stream")
    assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
    # Parse exactly one part (reading a fixed byte count can block waiting
    # for a second frame when the first JPEG is small).
    assert resp.readline().strip() == b"--frame"
    headers = {}
    while True:
        line = resp.readline().strip()
        if not line:
            break
        k, v = line.split(b":", 1)
        headers[k.strip().lower()] = v.strip()
    assert headers[b"content-type"] == b"image/jpeg"
    body = resp.read(int(headers[b"content-length"]))
    assert body[:2] == b"\xff\xd8"  # JPEG SOI marker


def test_controls_mutate_camera(viewer):
    theta0 = viewer.camera.theta_deg
    dist0 = viewer.camera.distance
    _get(viewer, "/control?op=orbit&dx=50&dy=0").read()
    _get(viewer, "/control?op=zoom&s=1").read()
    assert viewer.camera.theta_deg != theta0
    assert viewer.camera.distance < dist0  # zoom in, x0.9 (kernel.cu:1016-1022)


def test_cli_serve_smoke(tmp_path):
    """run --serve end-to-end: server answers while the sim steps."""
    import threading

    from n_body_problem_tpu.cli import main

    holder = {}
    orig = LiveViewer.__init__

    def spy(self, port, camera, **kw):
        orig(self, port, camera, **kw)
        holder["viewer"] = self

    import socket

    with socket.socket() as s:  # a free ephemeral port (--serve 0 = off)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    LiveViewer.__init__ = spy
    try:
        rc = main([
            "run", "--model", "plummer", "--n", "256", "--steps", "30",
            "--solver", "direct", "--steps-per-block", "10",
            "--serve", str(port), "--width", "64", "--height", "48",
            "--out", str(tmp_path),
        ])
    finally:
        LiveViewer.__init__ = orig
    assert rc == 0
    assert holder["viewer"].stats["step"] >= 10
