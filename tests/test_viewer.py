"""Interactive preview loop (viewer.py) + device-side display encode
(utils/display.py) — the minimal analog of the reference's live editor
viewport (ref RayTracerLayer.cpp:454-712) and zero-copy display path
(ref RayTracer.cu:2232-2256): progressive accumulation streams over
HTTP, camera edits reset accumulation, unchanged frames transfer no
bytes, and the u8 display path is byte-identical to write_png's
quantization of the f32 path.
"""

import io
import json
import time
import urllib.request

import numpy as np

from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)
from raytracerfacility_tpu.viewer import ProgressiveViewer
from tests.test_smoke import build_test_scene

SIZE = (64, 64)


def _get(port, path):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=30) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:  # urllib treats 304 as an error
        return e.code, dict(e.headers), b""


def test_render_u8_matches_png_quantization():
    cam = RayTracerCamera(build_test_scene())
    cam.camera.resize(SIZE)
    cam.camera.look_at_target((0, 1, 2.4), (0, 0.9, 0))
    env = EnvironmentProperties()
    ray = RayProperties(bounces=2, samples=1)
    f32 = cam.render(env, ray)
    cam2 = RayTracerCamera(build_test_scene())
    cam2.camera.resize(SIZE)
    cam2.camera.look_at_target((0, 1, 2.4), (0, 0.9, 0))
    u8 = cam2.render_u8(env, ray)
    want = (np.clip(f32[..., :3], 0.0, 1.0) * 255).astype(np.uint8)
    assert u8.dtype == np.uint8 and u8.shape == (*SIZE[::-1], 3)
    np.testing.assert_array_equal(u8, want)


def test_viewer_streams_and_resets_accumulation():
    viewer = ProgressiveViewer(
        build_test_scene(), ray=RayProperties(bounces=2, samples=1),
        eye=(0, 1, 2.4), target=(0, 0.9, 0), max_accum=3)
    viewer.cam.camera.resize(SIZE)
    port = viewer.start()
    try:
        status, _, body = _get(port, "/")
        assert status == 200 and b"frame.png" in body

        # first frame arrives and decodes at the right size (the first
        # render compiles; each long-poll round is capped at 10 s)
        deadline = time.time() + 180
        status, headers, png = 0, {}, b""
        while time.time() < deadline:
            status, headers, png = _get(port, "/frame.png?after=-1")
            if status == 200:
                break
        assert status == 200
        seq0 = int(headers["X-Seq"])
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape == (*SIZE[::-1], 3)

        # accumulation converges to max_accum and the loop idles
        deadline = time.time() + 120
        fid = 0
        while time.time() < deadline:
            _, _, body = _get(port, "/state")
            fid = json.loads(body)["frame_id"]
            if fid >= 3:
                break
            time.sleep(0.2)
        assert fid >= 3

        # converged: a long-poll past the current seq returns 304 (no
        # image bytes — the "no transfer when nothing changed" claim)
        _, _, body = _get(port, "/state")
        cur = json.loads(body)["seq"]
        status, _, _ = _get(port, f"/frame.png?after={cur + 999}")
        assert status == 304

        # a camera orbit resets accumulation (frame_id restarts)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/camera",
            data=json.dumps({"orbit": [40, 0]}).encode(),
            method="POST")
        assert urllib.request.urlopen(req, timeout=30).status == 204
        deadline = time.time() + 120
        saw_reset = False
        while time.time() < deadline:
            _, _, body = _get(port, "/state")
            st = json.loads(body)
            if st["seq"] > seq0 and st["frame_id"] <= 2:
                saw_reset = True
                break
            time.sleep(0.1)
        assert saw_reset
    finally:
        viewer.stop()
