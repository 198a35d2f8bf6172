"""Batched progressive rendering (render_frames_counted) must be
bit-identical to the per-frame host loop: the scan carry IS the frame
state, so N scanned frames and N sequential render_frame_counted calls
run the same arithmetic (ref CameraRendering.cu:112-147 accumulation)."""

import jax.numpy as jnp
import numpy as np

from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig,
    init_frame,
    render_frame_counted_jit,
    render_frames_counted_jit,
)
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties
from tests.test_smoke import build_test_scene


def test_scanned_frames_match_host_loop():
    scene = build_test_scene()
    compiled = scene.build()
    cam = CameraProperties(fov=60.0, size=(48, 32))
    cam.look_at_target((0.0, 1.0, 2.5), (0.0, 0.5, 0.0))
    cam_state = cam.state()
    env_state = EnvironmentProperties().state()
    config = RenderConfig(width=48, height=32, bounces=3, samples=1,
                          enable_textures=False, enable_vertex_color=False)

    n = 3
    frame_loop = init_frame(48, 32)
    rays_loop = 0.0
    for _ in range(n):
        frame_loop, rays = render_frame_counted_jit(
            compiled, cam_state, env_state, config, frame_loop)
        rays_loop += float(rays)

    frame_scan, rays_scan = render_frames_counted_jit(
        compiled, cam_state, env_state, config, init_frame(48, 32), n)

    assert int(frame_scan.frame_id) == n
    assert float(rays_scan) == rays_loop
    np.testing.assert_array_equal(np.asarray(frame_scan.color),
                                  np.asarray(frame_loop.color))
    np.testing.assert_array_equal(np.asarray(frame_scan.normal),
                                  np.asarray(frame_loop.normal))
    np.testing.assert_array_equal(np.asarray(frame_scan.albedo),
                                  np.asarray(frame_loop.albedo))
    assert np.isfinite(np.asarray(frame_scan.color)).all()
